package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{NumFns, VectorFns}
import graft.plans.GraftFunctions

/** Similarity search over an embedding column (builder mandate §G).
  *
  * Two paths:
  *  - bruteForceTopK: exact — score every vector, take k. One pass, no
  *    shuffle for the scoring (the query vector is a literal/broadcast);
  *    the top-k is a single reduction. The correctness baseline.
  *  - lshTopK: approximate — random-hyperplane LSH buckets computed from
  *    deterministic hash-derived planes; only the probe buckets are
  *    scored. At 100 TB the bucketed table is written partitioned by
  *    bucket id, so a query prunes to (multi-)probe partitions — the
  *    embedding-space analogue of the event store's (et, pid) pruning.
  *    An IVF variant would swap the hash planes for k-means centroids;
  *    the plumbing (bucket column + partition pruning + in-bucket rescue)
  *    is identical.
  */
object SimilarityOps {

  /** Exact top-k by cosine against one query vector (as a literal array).
    * `sim` is rounded to `roundTo` decimals before ranking so results are
    * reproducible across engines/partitionings; ties break on id. */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryVec: Seq[Double],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val q = array(queryVec.map(lit): _*)
    embeddings
      .select(
        col(idCol),
        NumFns.floorAt(GraftFunctions.cosine(VectorFns.toDouble(col(vecCol)), q), roundTo).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Approximate top-k: score only vectors in the query's LSH bucket.
    * Recall is tunable via nPlanes (fewer planes = bigger buckets). */
  def lshTopK(
      embeddings: DataFrame,
      queryVec: Seq[Double],
      k: Int,
      nPlanes: Int = 6,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val q = array(queryVec.map(lit): _*)
    val bucketed = withLshBucket(embeddings, nPlanes, vecCol)
    val queryBucket = bucketed.sparkSession.range(1)
      .select(VectorFns.rhpBucket(q, nPlanes).as("qb"))
    bucketed
      .join(broadcast(queryBucket), col("lsh_bucket") === col("qb"), "left_semi")
      .select(
        col(idCol),
        NumFns.floorAt(GraftFunctions.cosine(VectorFns.toDouble(col(vecCol)), q), roundTo).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Add the LSH bucket column (what the 100 TB layout partitions by). */
  def withLshBucket(embeddings: DataFrame, nPlanes: Int, vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn("lsh_bucket", VectorFns.rhpBucket(VectorFns.toDouble(col(vecCol)), nPlanes))

  /** All-pairs near-duplicates by cosine >= threshold, blocked by LSH
    * bucket (embedding-space near-dup dedup). Exact within buckets. */
  def embeddingNearDups(
      embeddings: DataFrame,
      threshold: Double,
      nPlanes: Int = 6,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    // bucket assignment feeds both sides of the self-join: compute once
    val b = withLshBucket(embeddings, nPlanes, vecCol)
      .select(col("lsh_bucket"), col(idCol).as("id"), VectorFns.toDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = b.select(col("lsh_bucket"), col("id").as("id1"), col("v").as("v1"))
    val r = b.select(col("lsh_bucket"), col("id").as("id2"), col("v").as("v2"))
    l.join(r, Seq("lsh_bucket")).filter(col("id1") < col("id2"))
      .withColumn("sim", NumFns.floorAt(GraftFunctions.cosine(col("v1"), col("v2")), 4))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }

  /** Exact pairwise top-k per probe id for a small probe set (broadcast
    * nested-loop scoring — the "many queries at once" path). */
  def batchTopK(embeddings: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
    val p = probes.select(col("vec_id").as("probe_id"), VectorFns.toDouble(col("embedding")).as("pv"))
    import org.apache.spark.sql.expressions.Window
    e.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .withColumn("sim", NumFns.floorAt(GraftFunctions.cosine(col("v"), col("pv")), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("probe_id", "vec_id", "sim", "rank")
  }
}
