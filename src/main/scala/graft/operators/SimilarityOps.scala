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
      vecCol: String = "embedding",
      reliable: Boolean = false): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    // bucket assignment feeds both sides of the self-join: compute once
    val b = withLshBucket(embeddings, nPlanes, vecCol)
      .select(col("lsh_bucket"), col(idCol).as("id"), VectorFns.toDouble(col(vecCol)).as("v"))
      .transform(Checkpoints.pin(_, reliable)) // lineage cut; reliable=true on clusters
    val l = b.select(col("lsh_bucket"), col("id").as("id1"), col("v").as("v1"))
    val r = b.select(col("lsh_bucket"), col("id").as("id2"), col("v").as("v2"))
    l.join(r, Seq("lsh_bucket")).filter(col("id1") < col("id2"))
      .withColumn("sim", NumFns.floorAt(GraftFunctions.cosine(col("v1"), col("v2")), 4))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }

  /** IVF centroids: deterministic hash-spread seeding + `nIters` Lloyd
    * steps, all in DataFrame ops (assign = broadcast cross join + windowed
    * argmin; update = per-dimension average via posexplode). k is small
    * (hundreds at most), so centroids always broadcast; the corpus is never
    * collected or re-shuffled beyond the per-dimension aggregation. */
  def ivfCentroids(
      embeddings: DataFrame,
      k: Int,
      nIters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val vecs = embeddings.select(col(idCol).as("id"), VectorFns.toDouble(col(vecCol)).as("v"))
    // Hash-spread deterministic seeds (no RNG: stable across runs/executors).
    // The k seed vectors are collected and re-emitted as a local relation:
    // numbering k rows is inherently a driver-scale task, and doing it with
    // a global window would funnel a distributed exchange through one
    // partition (WindowExec "no partition defined") for no benefit.
    val spark = embeddings.sparkSession
    import spark.implicits._
    var centroids = vecs
      .orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(k)
      .select(col("v"))
      .collect()
      .toSeq.zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Double](0)) }
      .toDF("cid", "centroid")
    (0 until nIters).foreach { _ =>
      val assigned = assignCells(vecs, centroids)
      // localCheckpoint per generation: materializes eagerly, truncates the
      // per-iteration plan growth, and old generations' blocks are dropped
      // by the ContextCleaner once unreferenced (no unpersist bookkeeping)
      centroids = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          e => e.getField("m")).as("centroid"))
        .select(col("cell").as("cid"), col("centroid"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Assign each vector to its nearest centroid (cosine argmax). */
  def assignCells(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid"))
    vecs.crossJoin(broadcast(centroids))
      .withColumn("csim", GraftFunctions.cosine(col("v"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cid").as("cell"))
  }

  /** IVF top-k: rank centroids against the query, scan only the nProbe
    * nearest cells. At 100 TB the assigned table is written partitioned by
    * `cell`, so the probe is directory-level partition pruning. */
  def ivfTopK(
      embeddings: DataFrame,
      centroids: DataFrame,
      queryVec: Seq[Double],
      k: Int,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val q = array(queryVec.map(lit): _*)
    val probeCells = centroids
      .select(col("cid"), GraftFunctions.cosine(col("centroid"), q).as("csim"))
      .orderBy(col("csim").desc, col("cid"))
      .limit(nProbe)
      .select(col("cid"))
    val vecs = embeddings.select(col(idCol).as("id"), VectorFns.toDouble(col(vecCol)).as("v"))
    assignCells(vecs, centroids)
      .join(broadcast(probeCells), col("cell") === col("cid"), "left_semi")
      .select(col("id").as(idCol),
        NumFns.floorAt(GraftFunctions.cosine(col("v"), q), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Symmetric int8 quantization stats per vector: q_i = round(x_i * 127 /
    * max|x|) clamped to [-127, 127] (the storage/bandwidth-reduction pass a
    * 100 TB embedding corpus runs before indexing; 4x smaller than float32).
    *
    * Runs as posexplode + two codegen hash aggregations (per-vector max,
    * then quantized stats) rather than per-element higher-order-function
    * lambdas, which evaluate interpreted (round-1 lesson). Rounding is
    * floor(x+0.5) — identical semantics in Spark and DuckDB, unlike
    * round() whose tie behavior differs between engines.
    *
    * Output: (vec_id, q_min, q_max, q_l1) — min/max quantized value and the
    * L1 norm of the quantized vector. */
  def quantizeStats(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val ex = embeddings
      .select(col(idCol), posexplode(VectorFns.toDouble(col(vecCol))).as(Seq("dim", "x")))
    val mx = ex.groupBy(col(idCol)).agg(max(abs(col("x"))).as("maxabs"))
    val q = when(col("maxabs") === 0.0, lit(0L))
      .otherwise(greatest(lit(-127L),
        least(lit(127L), floor(col("x") * 127.0 / col("maxabs") + 0.5))))
    ex.join(mx, idCol)
      .select(col(idCol), q.as("q"))
      .groupBy(col(idCol))
      .agg(min(col("q")).as("q_min"), max(col("q")).as("q_max"),
        sum(abs(col("q"))).as("q_l1"))
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
