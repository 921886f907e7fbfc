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
