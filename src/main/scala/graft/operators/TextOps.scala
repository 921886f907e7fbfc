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

  /** Per-doc corpus-frequency profile — the TF side of an LM-score quality
    * filter (CCNet-style: documents made of corpus-rare tokens are
    * outliers worth flagging; made of ultra-common ones, boilerplate).
    * Shape at 100 TB: one corpus-wide token-frequency aggregation, one
    * token-keyed join back (hot stopword tokens = the classic skewed join;
    * AQE's skew-split applies, unlike window skew), one per-doc
    * aggregation. All-integer arithmetic until the final exact-sum/count
    * division, so the oracle compares exactly. */
  def tokenCommonness(docs: DataFrame, reliable: Boolean = false): DataFrame = {
    // token explosion feeds both the frequency table and the join back:
    // compute once (lineage cut; reliable=true on clusters)
    val toks = Checkpoints.pin(
      docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok")), reliable)
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    toks.join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        min(col("c")).as("min_freq"),
        sum(col("c")).as("sum_freq"),
        (sum(col("c")).cast("double") / count(lit(1))).as("mean_freq"))
  }

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
