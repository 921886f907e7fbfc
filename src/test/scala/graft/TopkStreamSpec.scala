package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.StreamingOps

/** Streaming heavy hitters: per-batch frequent-items states combine to
  * the batch sketch, under replay, compaction (dedup, never re-merge),
  * parameter drift, and the lineage guard. */
class TopkStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private val b0 = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "alpha beta delta"))
  private val b1 = Seq(
    (3L, "gamma gamma epsilon alpha"),
    (4L, "zeta beta"))
  private val b2 = Seq((5L, "alpha zeta"))

  private def truth(rows: Seq[(Long, String)], k: Int) =
    TextOps.tokenHeavyHitters(docsOf(rows), k = k, maxTracked = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("streamed states combine to the batch sketch; replay is idempotent") {
    val path = s"${tmpDir()}/topk"
    StreamingOps.topkBatch(docsOf(b0), 0L, path, maxTracked = 64)
    StreamingOps.topkBatch(docsOf(b1), 1L, path, maxTracked = 64)
    StreamingOps.topkBatch(docsOf(b2), 2L, path, maxTracked = 64)
    val got = StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == truth(b0 ++ b1 ++ b2, 5), s"streamed top-k diverged: $got")
    StreamingOps.topkBatch(docsOf(b2), 2L, path, maxTracked = 64)
    val replayed = StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(replayed == got, "replay must not change the counts")
  }

  test("compaction dedups committed states (never re-merges), protects the newest") {
    val path = s"${tmpDir()}/topk"
    StreamingOps.topkBatch(docsOf(b0), 0L, path, maxTracked = 64)
    StreamingOps.topkBatch(docsOf(b1), 1L, path, maxTracked = 64)
    StreamingOps.topkBatch(docsOf(b2), 2L, path, maxTracked = 64)
    val before = StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    StreamingOps.compactTopkState(spark, path)
    val levels = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("__batch=")).toSet
    assert(levels == Set("__batch=-1", "__batch=2"), levels)
    val after = StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a double-counting fold would inflate every count — equality pins
    // the dedup-not-merge rule
    assert(after == before, s"compaction changed the counts: $after vs $before")
    // the newest batch can still replay over the compacted base
    StreamingOps.topkBatch(docsOf(b2), 2L, path, maxTracked = 64)
    assert(StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq == before)
  }

  test("reads are exact in BOTH of the fold's crash windows (overlap and hide)") {
    val path = s"${tmpDir()}/topk"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    StreamingOps.topkBatch(docsOf(b0), 0L, path, maxTracked = 64)
    StreamingOps.topkBatch(docsOf(b1), 1L, path, maxTracked = 64)
    val want = truth(b0 ++ b1, 5)
    // overlap: snapshot batch 0's state, compact, restore it — the same
    // count-based state visible twice must not merge twice
    val saved = new java.io.File(s"${tmpDir()}/saved_topk0")
    copyDir(new java.io.File(s"$path/__batch=0"), saved)
    StreamingOps.compactTopkState(spark, path)
    copyDir(saved, new java.io.File(s"$path/__batch=0"))
    def read() = StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(read() == want, s"overlap window double-merged a state: ${read()}")
    // hide: base retired but not replaced — the folded state is visible
    // only inside the leftover, which the reader must union back in
    fs.delete(p(s"$path/__batch=0"), true)
    require(fs.rename(p(s"$path/__batch=-1"), p(s"$path/_retired")))
    assert(read() == want, s"hide window dropped the folded state: ${read()}")
  }

  test("null-text docs land no phantom token (streamed == batch sketch with nulls present)") {
    val path = s"${tmpDir()}/topk"
    val withNulls = b0 ++ Seq((9L, null: String), (10L, null: String))
    StreamingOps.topkBatch(docsOf(withNulls), 0L, path, maxTracked = 64)
    val got = StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == truth(withNulls, 5),
      s"null-text docs must not land a phantom \"\" token: $got")
    assert(!got.exists(_._1 == ""), "no empty-string token may appear")
  }

  test("an empty micro-batch lands harmlessly and does not poison the combine") {
    val path = s"${tmpDir()}/topk"
    StreamingOps.topkBatch(docsOf(b0), 0L, path, maxTracked = 64)
    StreamingOps.topkBatch(docsOf(Seq.empty), 1L, path, maxTracked = 64)
    val got = StreamingOps.readTopK(spark, path, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == truth(b0, 5), s"empty batch changed the counts: $got")
  }

  test("parameter drift and foreign checkpoint lineage refuse loudly") {
    val path = s"${tmpDir()}/topk"
    StreamingOps.topkBatch(docsOf(b0), 0L, path, maxTracked = 64)
    val drift = intercept[IllegalArgumentException] {
      StreamingOps.topkBatch(docsOf(b1), 1L, path, maxTracked = 128)
    }
    assert(drift.getMessage.contains("maxTracked disagrees"))
    val lineage = intercept[IllegalArgumentException] {
      StreamingOps.topkBatch(docsOf(b1), -5L, path, maxTracked = 64)
    }
    assert(lineage.getMessage.contains("different checkpoint lineage"))
  }
}
