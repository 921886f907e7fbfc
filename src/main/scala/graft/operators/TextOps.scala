package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{NumFns, TextFns}

/** Text analysis operators over the documents table (builder mandate §G):
  * language id, quality scoring, token counting, fingerprinting. All
  * single-pass projections or one-shuffle aggregations.
  */
object TextOps {

  /** English-ish stopwords that exist in the synthetic corpus vocabulary. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-doc token statistics. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(TextFns.tokens(col("text"))).as("n_tokens"),
      size(TextFns.tokenSet(col("text"))).as("n_distinct"),
      TextFns.approxBpeCount(col("text")).as("n_bpeish"))

  /** Corpus statistics per (lang, source). */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        // exact integer sum / count: identical division in every engine,
        // unlike avg() whose accumulation order is engine-specific
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** N-gram-heuristic language id: stopword hits + vowel ratio vote.
    * (The synthetic corpus is language-agnostic; the operator's value is
    * its shape — a deterministic classifier projection.) */
  def langId(docs: DataFrame): DataFrame = {
    val hits = TextFns.stopwordHits(col("text"), EnStopwords)
    val vowelRatio = NumFns.floorAt(
      length(regexp_replace(col("text"), "[^aeiou]", "")) / length(col("text")).cast("double"), 4)
    docs.select(
      col("doc_id"), col("lang").as("lang_label"),
      hits.as("en_stopword_hits"),
      vowelRatio.as("vowel_ratio"),
      when(hits >= 2, "en").otherwise("other").as("lang_guess"))
  }

  /** Per-doc quality scoring. */
  def qualityScores(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(TextFns.tokens(col("text"))).as("n_tokens"),
      NumFns.floorAt(TextFns.punctRatio(col("text")), 4).as("punct_ratio"),
      NumFns.floorAt(TextFns.qualityScore(col("text")), 4).as("quality"))

  /** Canonical text normalization for dedup: lowercase, strip every char
    * outside [a-z0-9 ], collapse whitespace runs, trim. The standard
    * pre-pass that lets exact dedup catch case/punctuation variants the
    * raw-bytes hash misses. Pure codegen projection. */
  def normalize(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Exact dedup over NORMALIZED text: one keeper (min id) per canonical
    * form — same single-shuffle shape as DedupOps.exact, wider net. */
  def dedupNormalized(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(normalize(col("text"))).as("canon_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Corpus vocabulary: the `topK` most frequent k-token shingles — the
    * vocabulary/statistics pass a tokenizer-training pipeline runs. One
    * shuffle (map-side combined count), then a driver-scale top-k.
    * Deterministic total order: count desc, shingle asc. */
  def ngramVocabulary(docs: DataFrame, k: Int = 2, topK: Int = 50): DataFrame =
    CurationOps.shingleRows(docs, k, hashed = false)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("shingle"))
      .limit(topK)

  /** Content fingerprints: cryptographic (md5 of normalized text) +
    * rolling hashes — the engine-local xxhash token fold for shard-local
    * joins and the char-level polynomial variant whose arithmetic is
    * reproducible in ANSI SQL (the oracle-gated one). */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs.select(
      col("doc_id"),
      md5(to_binary(lower(col("text")), lit("utf-8"))).as("md5_norm"),
      TextFns.rollingFingerprint(col("text")).as("rolling_fp"),
      graft.plans.GraftFunctions.polyFp(col("text")).as("poly_fp"))
  }
}
