package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.streaming.StreamingOps

/** Streaming IVF-PQ index maintenance: micro-batches land codes-only
  * cell-partitioned deltas (base `__batch=-1` + batch-id-derived
  * directories), probes read the root unchanged, replay is idempotent,
  * the geometry sidecar refuses a drifted restart, and compactPqIndex
  * folds committed deltas without touching the protected newest one.
  * The single-batch oracle row is q_stream_pq. */
class PqStreamSpec extends SparkSpec {

  private val Dim = 8
  private val M = 4
  private val C = 3

  private def vecs(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      val base = Array.fill(Dim)(0.05 * ((i * 7 + 3) % 5))
      base(i % Dim) = 1.0 + 0.01 * (i % 3)
      (i.toLong, base.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def codebooks: Seq[Seq[(Int, Seq[Double])]] =
    (0 until M).map(s => (1 to C).map(cid =>
      (cid, (0 until Dim / M).map(j => if ((s * 17 + cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0))))

  private def cents = (1 to C).map(cid =>
    (cid, (0 until Dim).map(j => if ((cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)))

  private def q = (0 until Dim).map(j => 0.3 + 0.1 * j)

  private def topAll(path: String) =
    SimilarityOps.pqTopKIndexed(spark, path, cents, codebooks, q, k = 10, nProbe = C)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("streamed codes == batch-built index (probe-all top-k); replay overwrites") {
    val flat = s"${tmpDir()}/flat"
    SimilarityOps.writePqIndex(vecs(0 until 40), cents, codebooks, flat)
    val truth = SimilarityOps
      .pqTopKIndexed(spark, flat, cents, codebooks, q, k = 10, nProbe = C)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val ver = s"${tmpDir()}/ver"
    StreamingOps.pqIndexBase(vecs(0 until 20), cents, codebooks, ver)
    StreamingOps.pqBatch(vecs(20 until 30), 0L, cents, codebooks, ver, "vec_id", "embedding")
    StreamingOps.pqBatch(vecs(30 until 40), 1L, cents, codebooks, ver, "vec_id", "embedding")
    assert(topAll(ver) == truth)

    // checkpoint replay of the newest batch overwrites, never duplicates
    StreamingOps.pqBatch(vecs(30 until 40), 1L, cents, codebooks, ver, "vec_id", "embedding")
    assert(topAll(ver) == truth)
    assert(spark.read.parquet(ver).count() == 40)
    // codes-only at every level: no vector column anywhere
    assert(!spark.read.parquet(ver).schema.fieldNames.contains("v"))
  }

  test("geometry sidecar refuses a drifted restart before any landing") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.pqBatch(vecs(0 until 10), 0L, cents, codebooks, ver, "vec_id", "embedding")
    // fewer subspaces -> m and subDim both drift
    val drifted = (0 until M / 2).map(s => (1 to C).map(cid =>
      (cid, (0 until Dim / (M / 2)).map(j => if ((s + cid + j) % 2 == 0) 1.0 else -1.0))))
    val e = intercept[IllegalArgumentException] {
      StreamingOps.pqBatch(vecs(10 until 20), 1L, cents, drifted, ver, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("geometry disagrees"))
  }

  test("compactPqIndex folds committed deltas, protects the newest, keeps results") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.pqIndexBase(vecs(0 until 10), cents, codebooks, ver)
    StreamingOps.pqBatch(vecs(10 until 20), 0L, cents, codebooks, ver, "vec_id", "embedding")
    StreamingOps.pqBatch(vecs(20 until 30), 1L, cents, codebooks, ver, "vec_id", "embedding")
    StreamingOps.pqBatch(vecs(30 until 40), 2L, cents, codebooks, ver, "vec_id", "embedding")
    val before = topAll(ver)

    StreamingOps.compactPqIndex(spark, ver)
    val dirs = new java.io.File(ver).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs == Seq("__batch=-1", "__batch=2"))
    assert(topAll(ver) == before)
    assert(spark.read.parquet(ver).count() == 40)

    // the protected newest replays onto its own directory after the fold
    StreamingOps.pqBatch(vecs(30 until 40), 2L, cents, codebooks, ver, "vec_id", "embedding")
    assert(topAll(ver) == before)
  }

  test("pqBatch refuses an index written by a different checkpoint lineage") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.pqBatch(vecs(0 until 4), 5L, cents, codebooks, ver, "vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.pqBatch(vecs(4 until 8), 0L, cents, codebooks, ver, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
