package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.streaming.StreamingOps

/** Streaming ANN-index maintenance: micro-batches of embeddings land in
  * the versioned cell-partitioned IVF layout (base `__batch=-1` +
  * batch-id-derived deltas), probes read the root unchanged and still
  * prune to the probe cells, replay is idempotent, and compactIvfIndex
  * folds committed deltas without touching the protected newest one. */
class StreamingIvfSpec extends SparkSpec {

  // deterministic synthetic embeddings: 4 well-separated direction
  // clusters in R^4 with small per-vector jitter
  private def vecs(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      val base = Array.fill(4)(0.05 * ((i * 7 + 3) % 5))
      base((i % 4)) = 1.0 + 0.01 * (i % 3)
      (i.toLong, base.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def topAll(path: String, centroids: Seq[(Int, Seq[Double])], q: Seq[Double]) =
    SimilarityOps.ivfTopKIndexed(spark, path, centroids, q, 10, nProbe = centroids.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("streamed index == batch-built index (probe-all top-k)") {
    val all = vecs(0 until 40)
    val centroids = SimilarityOps.ivfCentroids(all, k = 4, nIters = 2)
    val q = all.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

    val flat = s"${tmpDir()}/flat"
    SimilarityOps.writeIvfIndex(all, centroids, flat)
    val truth = topAll(flat, centroids, q)

    // versioned: bootstrap a 20-vector base, stream the rest in 2 batches
    val ver = s"${tmpDir()}/ver"
    StreamingOps.ivfIndexBase(vecs(0 until 20), centroids, ver)
    StreamingOps.ivfBatch(vecs(20 until 30), 0L, centroids, ver, "vec_id", "embedding")
    StreamingOps.ivfBatch(vecs(30 until 40), 1L, centroids, ver, "vec_id", "embedding")
    assert(topAll(ver, centroids, q) == truth)

    // checkpoint replay of the newest batch overwrites, never duplicates
    StreamingOps.ivfBatch(vecs(30 until 40), 1L, centroids, ver, "vec_id", "embedding")
    assert(topAll(ver, centroids, q) == truth)
    assert(spark.read.parquet(ver).count() == 40)
  }

  test("probes prune to the probe-cell directories across batch levels") {
    val all = vecs(0 until 40)
    val centroids = SimilarityOps.ivfCentroids(all, k = 4, nIters = 2)
    val ver = s"${tmpDir()}/ver"
    StreamingOps.ivfIndexBase(vecs(0 until 20), centroids, ver)
    StreamingOps.ivfBatch(vecs(20 until 40), 0L, centroids, ver, "vec_id", "embedding")
    val q = all.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val probes = SimilarityOps.probeCellsOf(centroids, q, 1)
    val probed = SimilarityOps.ivfTopKIndexed(spark, ver, centroids, q, 10, nProbe = 1)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), s"no cell filter:\n$plan")
    val files = spark.read.parquet(ver).filter(col("cell").isin(probes: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f => probes.exists(c => f.contains(s"cell=$c"))))
    // both levels contribute (base and delta directories are read)
    assert(files.exists(_.contains("__batch=-1")) && files.exists(_.contains("__batch=0")))
  }

  test("compactIvfIndex folds committed deltas, protects the newest, keeps results") {
    val all = vecs(0 until 40)
    val centroids = SimilarityOps.ivfCentroids(all, k = 4, nIters = 2)
    val q = all.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val ver = s"${tmpDir()}/ver"
    StreamingOps.ivfIndexBase(vecs(0 until 10), centroids, ver)
    StreamingOps.ivfBatch(vecs(10 until 20), 0L, centroids, ver, "vec_id", "embedding")
    StreamingOps.ivfBatch(vecs(20 until 30), 1L, centroids, ver, "vec_id", "embedding")
    StreamingOps.ivfBatch(vecs(30 until 40), 2L, centroids, ver, "vec_id", "embedding")
    val before = topAll(ver, centroids, q)

    StreamingOps.compactIvfIndex(spark, ver)
    val dirs = new java.io.File(ver).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs == Seq("__batch=-1", "__batch=2"))
    assert(topAll(ver, centroids, q) == before)
    assert(spark.read.parquet(ver).count() == 40)

    // the protected newest replays onto its own directory after the fold
    StreamingOps.ivfBatch(vecs(30 until 40), 2L, centroids, ver, "vec_id", "embedding")
    assert(topAll(ver, centroids, q) == before)
  }

  test("ivfBatch refuses an index written by a different checkpoint lineage") {
    val centroids = SimilarityOps.ivfCentroids(vecs(0 until 8), k = 2, nIters = 1)
    val ver = s"${tmpDir()}/ver"
    StreamingOps.ivfBatch(vecs(0 until 4), 5L, centroids, ver, "vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.ivfBatch(vecs(4 until 8), 0L, centroids, ver, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
