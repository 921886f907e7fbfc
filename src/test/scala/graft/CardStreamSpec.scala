package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationOps
import graft.streaming.StreamingOps

/** Streaming dataset card: per-batch partial sums + distinct-key deltas
  * merge to exactly the batch card, under replay, compaction, and the
  * lineage guard. */
class CardStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "source", "lang", "text")

  private val b0 = Seq(
    (1L, "web", "en", "alpha beta gamma delta epsilon zeta"),
    (2L, "web", "en", "alpha beta gamma delta epsilon zeta"), // exact dup of 1
    (3L, "books", "de", "der schnelle braune fuchs springt"))
  private val b1 = Seq(
    (4L, "web", "fr", "le renard brun rapide saute par dessus"),
    (5L, "books", "de", "der schnelle braune fuchs springt"))  // dup of 3, later batch
  private val b2 = Seq(
    (6L, "web", "en", "completely different content about engines"))

  private def card(rows: Seq[(Long, String, String, String)]) =
    CurationOps.datasetCard(docsOf(rows))
      .orderBy("source").collect().map(_.toSeq).toSeq

  test("streamed card == batch card over the union; replay is idempotent") {
    val path = s"${tmpDir()}/card"
    StreamingOps.cardBatch(docsOf(b0), 0L, path)
    StreamingOps.cardBatch(docsOf(b1), 1L, path)
    StreamingOps.cardBatch(docsOf(b2), 2L, path)
    val got = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(got == card(b0 ++ b1 ++ b2),
      s"streamed card diverged from the batch truth: $got")
    // a checkpoint-replayed batch overwrites its own landing bit-identically
    StreamingOps.cardBatch(docsOf(b2), 2L, path)
    val replayed = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(replayed == got, "replay must not change the card")
  }

  test("compaction folds committed deltas, protects the newest, and preserves the card") {
    val path = s"${tmpDir()}/card"
    StreamingOps.cardBatch(docsOf(b0), 0L, path)
    StreamingOps.cardBatch(docsOf(b1), 1L, path)
    StreamingOps.cardBatch(docsOf(b2), 2L, path)
    val before = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    StreamingOps.compactCardState(spark, path)
    def levels(sub: String) =
      new java.io.File(s"$path/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("__batch=")).toSet
    // batches 0/1 folded into the base; batch 2 (replayable) untouched
    assert(levels("_sums") == Set("__batch=-1", "__batch=2"), levels("_sums"))
    assert(levels("_keys") == Set("__batch=-1", "__batch=2"), levels("_keys"))
    val after = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(after == before, "compaction must not change the card")
    // the newest batch can still replay over the compacted base
    StreamingOps.cardBatch(docsOf(b2), 2L, path)
    val replayed = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(replayed == before)
  }

  test("the card does not double-count partials in the fold's crash-overlap window") {
    val path = s"${tmpDir()}/card"
    StreamingOps.cardBatch(docsOf(b0), 0L, path)
    StreamingOps.cardBatch(docsOf(b1), 1L, path)
    val truth = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    // snapshot batch 0's _sums delta, compact (folds it into the base),
    // then restore it: the same partial sums visible in BOTH the base and
    // the folded delta — the (source, src) dedup must collapse them
    val d0 = new java.io.File(s"$path/_sums/__batch=0")
    val saved = new java.io.File(s"${tmpDir()}/saved_sums0")
    copyDir(d0, saved)
    StreamingOps.compactCardState(spark, path)
    copyDir(saved, d0)
    val got = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(got == truth, s"overlap window double-counted the partials: $got")
  }

  test("the card is exact in the fold's hide window (partials visible only in leftovers)") {
    val path = s"${tmpDir()}/card"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    StreamingOps.cardBatch(docsOf(b0), 0L, path)
    StreamingOps.cardBatch(docsOf(b1), 1L, path)
    val truth = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    StreamingOps.compactCardState(spark, path)
    // crash between base->retired and staging->base on BOTH sub-sinks
    require(fs.rename(p(s"$path/_sums/__batch=-1"), p(s"$path/_sums/_retired")))
    require(fs.rename(p(s"$path/_keys/__batch=-1"), p(s"$path/_keys/_retired")))
    val got = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(got == truth, s"hide window dropped the folded partials: $got")
  }

  test("approx (HLL) mode: streamed sketches merge to the batch card at sparse cardinalities") {
    val path = s"${tmpDir()}/card"
    StreamingOps.cardBatch(docsOf(b0), 0L, path, approx = true)
    StreamingOps.cardBatch(docsOf(b1), 1L, path, approx = true)
    StreamingOps.cardBatch(docsOf(b2), 2L, path, approx = true)
    val got = StreamingOps.readCard(spark, path, approx = true)
      .orderBy("source").collect().map(_.toSeq).toSeq
    // at these cardinalities the HLL sketch is in its exact (sparse)
    // regime, so the approx card equals the exact batch card outright
    assert(got == card(b0 ++ b1 ++ b2),
      s"approx card diverged from the batch truth: $got")
    // replay + fold keep the merged registers identical
    StreamingOps.cardBatch(docsOf(b2), 2L, path, approx = true)
    StreamingOps.compactCardState(spark, path)
    val after = StreamingOps.readCard(spark, path, approx = true)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(after == got)
  }

  test("approx mode: a source with texts but all-null langs reports 0 langs, not null") {
    val path = s"${tmpDir()}/card"
    val rows = Seq[(Long, String, String, String)](
      (1L, "web", null, "alpha beta gamma"),
      (2L, "web", null, "delta epsilon"))
    StreamingOps.cardBatch(rows.toDF("doc_id", "source", "lang", "text"), 0L, path, approx = true)
    val got = StreamingOps.readCard(spark, path, approx = true)
      .orderBy("source").collect().map(_.toSeq).toSeq
    val want = CurationOps.datasetCard(rows.toDF("doc_id", "source", "lang", "text"))
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(got == want, s"null-lang source diverged in approx mode: $got vs $want")
  }

  test("an empty micro-batch lands harmlessly in both modes") {
    val path = s"${tmpDir()}/card"
    val empty = docsOf(Seq.empty)
    StreamingOps.cardBatch(docsOf(b0), 0L, path)
    StreamingOps.cardBatch(empty, 1L, path)
    assert(StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq == card(b0))
    val pathA = s"${tmpDir()}/cardA"
    StreamingOps.cardBatch(docsOf(b0), 0L, pathA, approx = true)
    StreamingOps.cardBatch(empty, 1L, pathA, approx = true)
    assert(StreamingOps.readCard(spark, pathA, approx = true)
      .orderBy("source").collect().map(_.toSeq).toSeq == card(b0))
  }

  test("lineage guard: a batch id behind an existing delta refuses loudly") {
    val path = s"${tmpDir()}/card"
    StreamingOps.cardBatch(docsOf(b0), 5L, path)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.cardBatch(docsOf(b1), 3L, path)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }

  test("null text and lang do not land countable key rows (COUNT DISTINCT semantics)") {
    val path = s"${tmpDir()}/card"
    val rows = Seq[(Long, String, String, String)](
      (1L, "web", "en", "alpha beta gamma"),
      (2L, "web", null, null),
      (3L, "ghost", null, null)) // a source with ONLY null keys must not vanish
    StreamingOps.cardBatch(rows.toDF("doc_id", "source", "lang", "text"), 0L, path)
    val got = StreamingOps.readCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
    val want = CurationOps.datasetCard(rows.toDF("doc_id", "source", "lang", "text"))
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(got == want, s"null handling diverged: $got vs $want")
  }
}
