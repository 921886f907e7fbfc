package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.streaming.StreamingOps

/** Streaming k-NN graph maintenance: micro-batches of new embeddings fold
  * into the persisted graph with delta-proportional work; the resolved
  * state equals the batch knnGraph over everything landed so far (the
  * merge identity) at any fixed nProbe; replay is idempotent; the
  * latest-wins compaction folds committed deltas without touching the
  * protected newest one and recovers every crash ordering. */
class KnnStreamSpec extends SparkSpec {

  private def vecs(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map { i =>
      val base = Array.fill(4)(0.05 * ((i * 7 + 3) % 5))
      base(i % 4) = 1.0 + 0.01 * (i % 3)
      (i.toLong, base.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select(col("vec_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private val K = 3
  private val NP = 2 // reduced probes: the identity must hold there too

  private def truth(ids: Seq[Int], centroids: Seq[(Int, Seq[Double])]) =
    edgeSet(SimilarityOps.knnGraph(vecs(ids), centroids, k = K, nProbe = NP))

  test("multi-batch streamed graph == batch rebuild after every batch") {
    val centroids = SimilarityOps.ivfCentroids(vecs(0 until 20), k = 4, nIters = 2)
    val path = s"${tmpDir()}/g"
    StreamingOps.knnGraphBatch(vecs(0 until 20), 0L, centroids, K, NP, path)
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == truth(0 until 20, centroids))
    StreamingOps.knnGraphBatch(vecs(20 until 30), 1L, centroids, K, NP, path)
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == truth(0 until 30, centroids))
    StreamingOps.knnGraphBatch(vecs(30 until 44), 2L, centroids, K, NP, path)
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == truth(0 until 44, centroids))
  }

  test("replay of the newest batch is idempotent; lineage guard refuses stale checkpoints") {
    val centroids = SimilarityOps.ivfCentroids(vecs(0 until 20), k = 4, nIters = 2)
    val path = s"${tmpDir()}/g"
    StreamingOps.knnGraphBatch(vecs(0 until 20), 0L, centroids, K, NP, path)
    StreamingOps.knnGraphBatch(vecs(20 until 30), 1L, centroids, K, NP, path)
    val before = edgeSet(StreamingOps.readKnnGraph(spark, path))
    StreamingOps.knnGraphBatch(vecs(20 until 30), 1L, centroids, K, NP, path)
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == before, "replay changed the graph")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.knnGraphBatch(vecs(30 until 40), 0L, centroids, K, NP, path)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }

  test("crash window: corpus delta landed but edge delta lost -> replay heals") {
    val centroids = SimilarityOps.ivfCentroids(vecs(0 until 20), k = 4, nIters = 2)
    val path = s"${tmpDir()}/g"
    StreamingOps.knnGraphBatch(vecs(0 until 20), 0L, centroids, K, NP, path)
    StreamingOps.knnGraphBatch(vecs(20 until 30), 1L, centroids, K, NP, path)
    // simulate the crash: batch 1's edge delta vanishes (corpus remains)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.delete(new org.apache.hadoop.fs.Path(s"$path/edges/__batch=1"), true))
    StreamingOps.knnGraphBatch(vecs(20 until 30), 1L, centroids, K, NP, path)
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == truth(0 until 30, centroids))
  }

  test("compaction folds committed deltas latest-wins, protects the newest, survives a mid-fold crash") {
    val centroids = SimilarityOps.ivfCentroids(vecs(0 until 20), k = 4, nIters = 2)
    val path = s"${tmpDir()}/g"
    StreamingOps.knnGraphBatch(vecs(0 until 20), 0L, centroids, K, NP, path)
    StreamingOps.knnGraphBatch(vecs(20 until 30), 1L, centroids, K, NP, path)
    StreamingOps.knnGraphBatch(vecs(30 until 44), 2L, centroids, K, NP, path)
    StreamingOps.compactKnnGraph(spark, path)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // batches 0 and 1 folded into the base; the newest delta is untouched
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$path/edges/__batch=-1")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/edges/__batch=0")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/edges/__batch=1")))
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$path/edges/__batch=2")))
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == truth(0 until 44, centroids))
    // NARROW next batch: three same-cluster vectors (all ≡ 0 mod 4) touch
    // only their cluster's cells, so most old queries are UNAFFECTED and
    // their rows exist nowhere but the compacted base — the recovery
    // asserts below are blind without this (a broad batch rewrites every
    // query into its own delta and masks a lost base)
    val narrow = Seq(44, 48, 52)
    val allIds = (0 until 44) ++ narrow
    StreamingOps.knnGraphBatch(vecs(narrow), 3L, centroids, K, NP, path)
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == truth(allIds, centroids))
    assert(
      spark.read.option("basePath", s"$path/edges").parquet(s"$path/edges")
        .filter(col("__batch") === 3).select(col("vec_id")).distinct().count() < 44,
      "narrow batch unexpectedly rewrote every query — recovery coverage lost")
    // fold batch 2 under the base (3 stays protected), then manufacture
    // the mid-fold crash window: the base strands as a finished staging
    // that never renamed; recovery must restore it as newer-than-retired
    // without interleaving superseded snapshots of one query
    StreamingOps.compactKnnGraph(spark, path)
    val base = new org.apache.hadoop.fs.Path(s"$path/edges/__batch=-1")
    val staging = new org.apache.hadoop.fs.Path(s"$path/edges/_compacting")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/edges/_tmpbase")
    assert(f.rename(base, tmp) && f.rename(tmp, staging))
    StreamingOps.compactKnnGraph(spark, path)
    assert(edgeSet(StreamingOps.readKnnGraph(spark, path)) == truth(allIds, centroids))
  }
}
