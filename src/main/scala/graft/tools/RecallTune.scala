package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.sources.Tables

/** One-off harness: measure ANN recall@k vs brute force across parameter
  * settings, per scale factor — used to pick the full-recall params that
  * back the g_sim_ann / g_sim_ivf oracle gates.
  *
  * Driver-side by design: it collect()s top-k id sets and (below) pair
  * lists, which is fine at tuning scale (k=20 sets; sf<=0.01 pair lists)
  * but NOT a pattern for production paths — at 100 TB a pair list does not
  * fit a driver. Tune on a sample; the engine operators themselves never
  * collect unbounded sets. */
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

      // minhash pair recall vs exact unblocked jaccard >= 0.5
      import graft.operators.DedupOps
      import graft.plans.GraftFunctions
      GraftFunctions.register(spark)
      val docs = Tables.documents(spark, dir)
      val toks = docs.select(col("doc_id"),
        array_distinct(graft.functions.TextFns.shingles(col("text"), 3)).as("toks"))
        .localCheckpoint(true)
      val exactPairs = toks.select(col("doc_id").as("id1"), col("toks").as("t1"))
        .join(toks.select(col("doc_id").as("id2"), col("toks").as("t2")),
          col("id1") < col("id2"))
        .filter(DedupOps.jaccardArrays(col("t1"), col("t2")) >= 0.5)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mh = DedupOps.minHashNearDups(docs, threshold = 0.5)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"$sf minhash exact=${exactPairs.size} found=${mh.size} " +
        s"subset=${mh.subsetOf(exactPairs)} recall=${
          if (exactPairs.isEmpty) 1.0 else (mh & exactPairs).size.toDouble / exactPairs.size}")

      // embedding near-dup recall vs exact all-pairs cosine >= 0.35
      val ev = e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")).localCheckpoint(true)
      val exactE = ev.select(col("id").as("id1"), col("v").as("v1"))
        .join(ev.select(col("id").as("id2"), col("v").as("v2")), col("id1") < col("id2"))
        .filter(GraftFunctions.cosine(col("v1"), col("v2")) >= 0.35)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (planes <- Seq(2, 3, 4); thr <- Seq(0.35, 0.45)) {
        val exactT = ev.select(col("id").as("id1"), col("v").as("v1"))
          .join(ev.select(col("id").as("id2"), col("v").as("v2")), col("id1") < col("id2"))
          .filter(GraftFunctions.cosine(col("v1"), col("v2")) >= thr)
          .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val lsh = SimilarityOps.embeddingNearDups(e, threshold = thr, nPlanes = planes)
          .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"$sf embed nPlanes=$planes thr=$thr exact=${exactT.size} found=${lsh.size} " +
          s"subset=${lsh.subsetOf(exactT)} recall=${
            if (exactT.isEmpty) 1.0 else (lsh & exactT).size.toDouble / exactT.size}")
      }
    }
    spark.stop()
  }
}
