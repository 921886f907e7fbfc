package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AssemblyOps
import graft.streaming.StreamingOps

/** Incremental/streaming concat-and-chunk packing — the packed manifest
  * as a maintained asset: per-batch span/offset deltas, cross-batch tail
  * re-emission (the slices a previous batch's incomplete final sequence
  * withheld), O(delta) batch cost, replay idempotency, geometry drift
  * refusal, lineage refusal, and the both-root fold. The single-batch
  * oracle row is q_stream_pack. */
class PackStreamSpec extends SparkSpec {
  import spark.implicits._

  private val L = 32L

  private def lens: Map[Long, Int] = {
    val rnd = new scala.util.Random(23)
    (0L until 60L).map(i => i -> (1 + rnd.nextInt(20))).toMap
  }

  private def docs(ids: Range): DataFrame =
    ids.map(i => (i.toLong, Seq.fill(lens(i.toLong))("w").mkString(" ")))
      .toDF("doc_id", "text")

  private def batch(ids: Range, id: Long, path: String): Unit =
    StreamingOps.packBatch(docs(ids), id, path, L, 8L, 64L, "doc_id", "text", 16L)

  private def readBack(path: String): Seq[(Long, Long, Long, Long, Long)] =
    StreamingOps.readPackIndex(spark, path)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted

  private def truth(ids: Range): Seq[(Long, Long, Long, Long, Long)] =
    AssemblyOps.packTokenSpans(docs(ids), L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted

  test("streamed deltas read back == batch packer; tail re-emission crosses batches") {
    val p = s"${tmpDir()}/idx"
    StreamingOps.packIndexBase(docs(0 until 20), p, L, 8L, 64L)
    batch(20 until 40, 0L, p)
    batch(40 until 60, 1L, p)
    assert(readBack(p) == truth(0 until 60))
    // the tail re-emission actually happened: some batch-0/1 delta holds
    // spans of docs from an EARLIER arrival range (their withheld tail)
    val later = spark.read
      .schema("seq_id LONG, seq_pos LONG, doc_id LONG, doc_start LONG, len LONG, sb LONG, __batch LONG")
      .parquet(s"$p/spans").filter(col("__batch") >= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(later.exists(_ < 20L))
    // replay of the newest batch overwrites, never duplicates
    batch(40 until 60, 1L, p)
    assert(readBack(p) == truth(0 until 60))
  }

  test("prefix property: every committed state is the batch packer over the prefix") {
    val p = s"${tmpDir()}/idx"
    StreamingOps.packIndexBase(docs(0 until 25), p, L, 8L, 64L)
    assert(readBack(p) == truth(0 until 25))
    batch(25 until 45, 0L, p)
    assert(readBack(p) == truth(0 until 45))
  }

  test("compactPackIndex folds both roots, protects the newest, keeps the readback") {
    val p = s"${tmpDir()}/idx"
    StreamingOps.packIndexBase(docs(0 until 20), p, L, 8L, 64L)
    batch(20 until 35, 0L, p)
    batch(35 until 50, 1L, p)
    batch(50 until 60, 2L, p)
    val before = readBack(p)
    StreamingOps.compactPackIndex(spark, p)
    def levels(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(levels(s"$p/spans") == Seq("__batch=-1", "__batch=2"))
    assert(levels(s"$p/_offsets") == Seq("__batch=-1", "__batch=2"))
    assert(readBack(p) == before)
    // a further batch continues from the folded totals
    // (ids beyond the fixture: constant-length docs)
    val extra = (60L until 70L).map(i => (i, Seq.fill(7)("w").mkString(" ")))
      .toDF("doc_id", "text")
    StreamingOps.packBatch(extra, 3L, p, L, 8L, 64L, "doc_id", "text", 16L)
    val all = lens ++ (60L until 70L).map(_ -> 7).toMap
    val full = AssemblyOps.packTokenSpans(
      all.toSeq.sortBy(_._1).map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text"), L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(readBack(p) == full)
  }

  test("geometry sidecar refuses a drifted restart; lineage refusal") {
    val p = s"${tmpDir()}/idx"
    batch(0 until 10, 0L, p)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.packBatch(docs(10 until 20), 1L, p, L + 1, 8L, 64L,
        "doc_id", "text", 16L)
    }
    assert(e.getMessage.contains("geometry mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      StreamingOps.packBatch(docs(10 until 20), -1L, p, L, 8L, 64L,
        "doc_id", "text", 16L)
    }
    assert(e2.getMessage.contains("different checkpoint lineage"))
  }

  test("foreign checkpoint after a partial crash is refused on the offsets root") {
    val p = s"${tmpDir()}/idx"
    StreamingOps.packIndexBase(docs(0 until 20), p, L, 8L, 64L)
    batch(20 until 40, 0L, p)
    batch(40 until 50, 1L, p)
    // crash between batch 1's two writes: its offsets delta landed, its
    // spans delta did not — the spans root alone now looks clean
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(s"$p/spans/__batch=1"))
    // a foreign checkpoint restarting below the orphaned offsets delta
    // must refuse: before the dual-root guard the spans root passed and
    // the restart would march forward to silently overwrite __batch=1
    // (and read a wrong T_prev frontier meanwhile)
    val e = intercept[IllegalArgumentException] { batch(40 until 50, 0L, p) }
    assert(e.getMessage.contains("different checkpoint lineage"))
    // the ORIGINAL checkpoint's replay of the crashed batch still heals
    batch(40 until 50, 1L, p)
    assert(readBack(p) == truth(0 until 50))
  }

  test("offsets-first crash window: hidden sequences heal on replay") {
    val p = s"${tmpDir()}/idx"
    StreamingOps.packIndexBase(docs(0 until 30), p, L, 8L, 64L)
    val committed = readBack(p)
    // simulate a crash between packBatch's two writes: batch 0's offsets
    // landed, its spans did not (write them, then delete the spans dir)
    batch(30 until 60, 0L, p)
    val spansDir = new java.io.File(s"$p/spans/__batch=0")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(spansDir)
    // readers see exactly the committed prefix — no torn spans
    assert(readBack(p) == committed)
    // the replayed batch heals the window into the converged corpus
    batch(30 until 60, 0L, p)
    assert(readBack(p) == truth(0 until 60))
  }
}
