package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.streaming.StreamingOps

/** Streaming mini-batch k-means: the centroid sink's sequential
  * semantics (batch N assigns against seed ⊕ state < N), exact-integer
  * state folding, replay idempotence, drifted-seed refusal, and the
  * manifest-ruled compaction (integer sums are not idempotent, so the
  * fold's crash windows must be recovered by RULE, not by over-merge —
  * unlike the Bloom sink's OR). */
class KmeansStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private def vec(i: Int): Seq[Double] =
    (0 until dim).map(d => math.sin(i * 7 + d * 3).toFloat.toDouble)
  private val seed: Seq[(Int, Seq[Double])] =
    (1 to 3).map(c => (c, (0 until dim).map(d => math.cos(c * 5 + d).toDouble)))

  private def batchDf(ids: Seq[Int]) =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  /** Driver reference of the full sequential protocol. */
  private def refRun(batches: Seq[Seq[Int]]): Map[(Int, Int), (Long, Long)] = {
    val state = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
    batches.foreach { ids =>
      val centroids = seed.map { case (cid, c) =>
        val dims = (0 until dim).flatMap { d =>
          state.get((cid, d)).map { case (sx, n) => sx.toDouble / (1e6 * n) }
        }
        (cid, if (dims.size == dim) dims else c)
      }
      ids.foreach { i =>
        val v = vec(i)
        val best = centroids.map { case (cid, c) =>
          (SimilarityOps.cosineOf(v, c), -cid) }.max
        val cell = -best._2
        (0 until dim).foreach { d =>
          val (sx, n) = state.getOrElse((cell, d), (0L, 0L))
          state((cell, d)) = (sx + math.floor(v(d) * 1e6).toLong, n + 1)
        }
      }
    }
    state.toMap
  }

  private def readState(path: String): Map[(Int, Int), (Long, Long)] =
    spark.read.parquet(new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("__batch=")).map(_.toString): _*)
      .groupBy(col("cell"), col("dim"))
      .agg(sum(col("sx")).as("sx"), sum(col("n_vecs")).as("n"))
      .collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Int]("dim")) ->
        ((r.getAs[Long]("sx"), r.getAs[Long]("n")))).toMap

  test("three sequential batches equal the driver reference protocol exactly") {
    val out = tmpDir()
    val batches = Seq(Seq(0, 1, 2, 3, 4), Seq(5, 6, 7), Seq(8, 9, 10, 11))
    batches.zipWithIndex.foreach { case (ids, b) =>
      StreamingOps.kmeansBatch(batchDf(ids), b, s"$out/km", seed, "vec_id", "embedding")
    }
    assert(readState(s"$out/km") == refRun(batches))
    // the readback face agrees with the folded state
    val means = StreamingOps.readStreamKmeans(spark, s"$out/km").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Int]("dim")) ->
        ((r.getAs[Double]("mean_x"), r.getAs[Long]("n_vecs")))).toMap
    refRun(batches).foreach { case ((c, d), (sx, n)) =>
      assert(means((c, d)) == ((sx.toDouble / (1e6 * n), n)))
    }
  }

  test("replaying a batch overwrites its own state — bit-identical end state") {
    val out = tmpDir()
    StreamingOps.kmeansBatch(batchDf(Seq(0, 1, 2)), 0, s"$out/km", seed, "vec_id", "embedding")
    StreamingOps.kmeansBatch(batchDf(Seq(3, 4)), 1, s"$out/km", seed, "vec_id", "embedding")
    val before = readState(s"$out/km")
    // a crash-replay of batch 1: same input, same id
    StreamingOps.kmeansBatch(batchDf(Seq(3, 4)), 1, s"$out/km", seed, "vec_id", "embedding")
    assert(readState(s"$out/km") == before)
  }

  test("lineage guard: a stale checkpoint's batch id is refused") {
    val out = tmpDir()
    StreamingOps.kmeansBatch(batchDf(Seq(0, 1)), 3, s"$out/km", seed, "vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.kmeansBatch(batchDf(Seq(2)), 1, s"$out/km", seed, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("checkpoint lineage"))
  }

  test("drifted seed geometry is refused by the sidecar") {
    val out = tmpDir()
    StreamingOps.kmeansBatch(batchDf(Seq(0, 1)), 0, s"$out/km", seed, "vec_id", "embedding")
    val drifted = (1 to 4).map(c => (c, (0 until dim).map(_.toDouble)))
    val e = intercept[IllegalArgumentException] {
      StreamingOps.kmeansBatch(batchDf(Seq(2)), 1, s"$out/km", drifted, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("seed geometry"))
  }

  test("compaction folds committed levels, protects the newest, preserves sums") {
    val out = tmpDir()
    (0 to 3).foreach { b =>
      StreamingOps.kmeansBatch(batchDf(Seq(b * 3, b * 3 + 1, b * 3 + 2)), b,
        s"$out/km", seed, "vec_id", "embedding")
    }
    val before = readState(s"$out/km")
    StreamingOps.compactKmeansState(spark, s"$out/km")
    val dirs = new java.io.File(s"$out/km").listFiles()
      .map(_.getName).filter(_.startsWith("__batch=")).sorted.toSeq
    // levels 0..2 folded into __batch=2; newest (3) untouched
    assert(dirs == Seq("__batch=2", "__batch=3"), s"got $dirs")
    assert(readState(s"$out/km") == before)
    // a further batch reads the same accumulated state as without the fold
    StreamingOps.kmeansBatch(batchDf(Seq(20, 21)), 4, s"$out/km", seed, "vec_id", "embedding")
    val batches = Seq(Seq(0, 1, 2), Seq(3, 4, 5), Seq(6, 7, 8), Seq(9, 10, 11), Seq(20, 21))
    assert(readState(s"$out/km") == refRun(batches))
  }

  test("compaction crash windows: completed staging is counted exactly once and recovery finishes the fold") {
    val out = tmpDir()
    (0 to 2).foreach { b =>
      StreamingOps.kmeansBatch(batchDf(Seq(b * 2, b * 2 + 1)), b,
        s"$out/km", seed, "vec_id", "embedding")
    }
    val truth = readState(s"$out/km")
    // simulate: fold of levels 0-1 completed its staging (manifest present)
    // but crashed BEFORE deleting the sources
    val km = new java.io.File(s"$out/km")
    val staging = new java.io.File(km, "_staging_kmfold")
    spark.read.parquet(s"$out/km/__batch=0", s"$out/km/__batch=1")
      .groupBy(col("cell"), col("dim"))
      .agg(sum(col("sx")).as("sx"), sum(col("n_vecs")).as("n_vecs"))
      .coalesce(1).write.parquet(staging.toString)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging.toString, "_folded.json"),
      """{"folded":["__batch=0","__batch=1"]}""".getBytes)
    // a reader in this window must NOT double-count levels 0-1
    val sums = StreamingOps.accumulatedSums(spark, s"$out/km", Long.MaxValue)
      .map { case (c, d, sx, n) => (c, d) -> ((sx, n)) }.toMap
    assert(sums == truth, "staging window double-counted folded levels")
    // and a batch arriving in this window sees the correct frontier too
    StreamingOps.kmeansBatch(batchDf(Seq(10, 11)), 3, s"$out/km", seed, "vec_id", "embedding")
    // re-running compaction completes the interrupted fold deterministically
    StreamingOps.compactKmeansState(spark, s"$out/km")
    val dirs = km.listFiles().map(_.getName).filter(_.startsWith("__batch=")).sorted.toSeq
    assert(dirs == Seq("__batch=1", "__batch=2", "__batch=3"), s"got $dirs")
    val expect = refRun(Seq(Seq(0, 1), Seq(2, 3), Seq(4, 5), Seq(10, 11)))
    assert(readState(s"$out/km") == expect)
  }
}
