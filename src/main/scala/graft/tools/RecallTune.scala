package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.sources.Tables

/** One-off harness: measure ANN recall@k vs brute force across parameter
  * settings, per scale factor — used to pick the full-recall params that
  * back the g_sim_ann / g_sim_ivf oracle gates. */
object RecallTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val e = Tables.embeddings(spark, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val brute = SimilarityOps.bruteForceTopK(e, q, 20)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      for (flips <- 0 to 4) {
        val ann = SimilarityOps.lshTopK(e, q, 20, nPlanes = 4, maxProbeFlips = flips)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        println(s"$sf lsh nPlanes=4 flips=$flips recall=${(ann & brute).size / 20.0}")
      }
      val centroids = SimilarityOps.ivfCentroids(e, k = 16, nIters = 2)
      for (np <- Seq(2, 4, 6, 8, 10, 12, 16)) {
        val ann = SimilarityOps.ivfTopK(e, centroids, q, 20, nProbe = np)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        println(s"$sf ivf k=16 nProbe=$np recall=${(ann & brute).size / 20.0}")
      }
    }
    spark.stop()
  }
}
