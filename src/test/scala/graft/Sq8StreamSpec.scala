package graft

import graft.operators.SimilarityOps
import graft.streaming.StreamingOps

/** Streaming IVF-SQ8 index maintenance — the [[PqStreamSpec]] contract
  * one rung down the compression ladder: micro-batches land codes-only
  * (d int8s) cell-partitioned deltas, probes read the root unchanged,
  * replay is idempotent, the (k, dim) sidecar refuses a drifted restart,
  * and compactSq8Index folds committed deltas without touching the
  * protected newest one. The single-batch oracle row is q_stream_sq8. */
class Sq8StreamSpec extends SparkSpec {

  private val Dim = 8
  private val C = 3

  private def vecs(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      val base = Array.fill(Dim)(0.05 * ((i * 7 + 3) % 5))
      base(i % Dim) = 1.0 + 0.01 * (i % 3)
      (i.toLong, base.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def cents = (1 to C).map(cid =>
    (cid, (0 until Dim).map(j => if ((cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)))

  private def q = (0 until Dim).map(j => 0.3 + 0.1 * j)

  private def topAll(path: String) =
    SimilarityOps.sq8TopKIndexed(spark, path, cents, vecs(0 until 40), q,
      k = 10, nProbe = C, refine = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("streamed codes == batch-built index (probe-all top-k); replay overwrites") {
    val flat = s"${tmpDir()}/flat"
    SimilarityOps.writeSq8Index(vecs(0 until 40), cents, flat)
    val truth = topAll(flat)

    val ver = s"${tmpDir()}/ver"
    StreamingOps.sq8IndexBase(vecs(0 until 20), cents, ver)
    StreamingOps.sq8Batch(vecs(20 until 30), 0L, cents, ver, "vec_id", "embedding")
    StreamingOps.sq8Batch(vecs(30 until 40), 1L, cents, ver, "vec_id", "embedding")
    assert(topAll(ver) == truth)

    // checkpoint replay of the newest batch overwrites, never duplicates
    StreamingOps.sq8Batch(vecs(30 until 40), 1L, cents, ver, "vec_id", "embedding")
    assert(topAll(ver) == truth)
    assert(spark.read.parquet(ver).count() == 40)
    // codes-only at every level: no vector column anywhere
    assert(!spark.read.parquet(ver).schema.fieldNames.contains("v"))
  }

  test("geometry sidecar refuses a drifted restart") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.sq8Batch(vecs(0 until 10), 0L, cents, ver, "vec_id", "embedding")
    val drifted = cents.take(C - 1) // fewer cells -> k drifts
    val e = intercept[IllegalArgumentException] {
      StreamingOps.sq8Batch(vecs(10 until 20), 1L, drifted, ver, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("geometry mismatch"))
  }

  test("compactSq8Index folds committed deltas, protects the newest, keeps results") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.sq8IndexBase(vecs(0 until 10), cents, ver)
    StreamingOps.sq8Batch(vecs(10 until 20), 0L, cents, ver, "vec_id", "embedding")
    StreamingOps.sq8Batch(vecs(20 until 30), 1L, cents, ver, "vec_id", "embedding")
    StreamingOps.sq8Batch(vecs(30 until 40), 2L, cents, ver, "vec_id", "embedding")
    val before = topAll(ver)

    StreamingOps.compactSq8Index(spark, ver)
    val dirs = new java.io.File(ver).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs == Seq("__batch=-1", "__batch=2"))
    assert(topAll(ver) == before)
    assert(spark.read.parquet(ver).count() == 40)

    // the protected newest replays onto its own directory after the fold
    StreamingOps.sq8Batch(vecs(30 until 40), 2L, cents, ver, "vec_id", "embedding")
    assert(topAll(ver) == before)
  }

  test("sq8Batch refuses an index written by a different checkpoint lineage") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.sq8Batch(vecs(0 until 4), 5L, cents, ver, "vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.sq8Batch(vecs(4 until 8), 0L, cents, ver, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
