package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps
import graft.streaming.StreamingOps

/** Streaming multimodal release report: slim per-batch evidence (sums,
  * chunk addresses, frame index, dup endpoints) assembles to exactly the
  * batch mediaCard — including pairs whose members land in DIFFERENT
  * batches — under replay, compaction, and the lineage guard. */
class MediaCardStreamSpec extends SparkSpec {
  import spark.implicits._

  // > 128 bytes so every real doc samples >= 2 frames (64-byte stub frames)
  private val pad = " lorem ipsum dolor sit amet consectetur adipiscing elit" +
    " sed do eiusmod tempor incididunt ut labore et dolore magna aliqua"
  private def docsOf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")
  private val b0 = Seq(
    (1L, "web", "alpha beta gamma delta" + pad),
    (2L, "web", "alpha beta gamma delta" + pad), // byte-dup of 1, same batch
    (3L, "books", ("totally different words about spark engines" + pad).toUpperCase))
  private val b1 = Seq(
    (4L, "web", "alpha beta gamma delta" + pad), // byte-dup of 1/2, LATER batch
    (5L, "books", "short")) // < 64 bytes -> zero frames, still counted
  private val b2 = Seq(
    (6L, "archive", "yet another corpus slice with its own words" + pad))

  private def card(rows: Seq[(Long, String, String)]) =
    MultimodalOps.mediaCard(docsOf(rows))
      .orderBy("source").collect().map(_.toSeq).toSeq
  private def streamed(path: String) =
    StreamingOps.readMediaCard(spark, path)
      .orderBy("source").collect().map(_.toSeq).toSeq
  private def land(path: String, rows: Seq[(Long, String, String)], id: Long): Unit =
    StreamingOps.mediaCardBatch(docsOf(rows), id, path,
      fps = 4, k = 8, maxDist = 3, minFrames = 2, w = 8, divisor = 16,
      nBuckets = 8)

  test("streamed card == batch card; cross-batch dup pairs count; replay idempotent") {
    val path = s"${tmpDir()}/mcard"
    land(path, b0, 0L)
    assert(streamed(path) == card(b0))
    // doc 4 duplicates docs 1/2 from the PREVIOUS batch: the pair is
    // discovered when the later member lands, so the cluster mass grows
    // on the web stratum without any read-time self-join
    land(path, b1, 1L)
    assert(streamed(path) == card(b0 ++ b1))
    // a checkpoint-replayed batch overwrites its own landings bit-identically
    land(path, b1, 1L)
    assert(streamed(path) == card(b0 ++ b1))
  }

  test("compaction folds committed deltas, protects the newest, preserves the card") {
    val path = s"${tmpDir()}/mcard"
    land(path, b0, 0L)
    land(path, b1, 1L)
    land(path, b2, 2L)
    val before = streamed(path)
    assert(before == card(b0 ++ b1 ++ b2))
    StreamingOps.compactMediaCardState(spark, path)
    def levels(sub: String) =
      new java.io.File(s"$path/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("__batch=")).toSet
    assert(levels("_sums") == Set("__batch=-1", "__batch=2"), levels("_sums"))
    assert(levels("_dup") == Set("__batch=-1", "__batch=2"), levels("_dup"))
    assert(streamed(path) == before, "compaction must not change the card")
    // an older-lineage batch refuses instead of clobbering history
    val e = intercept[IllegalArgumentException](land(path, b0, 0L))
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
