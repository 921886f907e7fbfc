package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Composed "forget this document everywhere" — the compliance delete a
  * 100 TB pipeline runs routinely (reference delete semantics: A5
  * `CassandraEventStore.cs:126-146`, A7 `IndexByEventTypeStore.cs:63-83`,
  * composed per-table exactly as the reference's callers compose them).
  * The engine has a delete/rewrite primitive per artifact; this object
  * adds the per-derived-artifact faces the primitives don't cover and the
  * single audited pass that tombstones one id set across ALL of them:
  *
  *   - the versioned event/doc log ([[graft.sources.Generations.deleteAndPromote]])
  *   - the MinHash LSH index (partition-pruned rewrite, [[forgetFromLshIndex]])
  *   - the shingle-count span index (negative-count delta, [[forgetFromShingleIndex]])
  *   - the positional postings index ([[forgetFromPostingsIndex]])
  *   - the banded pHash video index ([[forgetFromPhashIndex]])
  *   - the cell-partitioned ANN stores (IVF raw / IVF-SQ8 codes,
  *     [[forgetFromCellIndex]] — home cells under the frozen centroids)
  *   - the content-addressed chunk store
  *     ([[MultimodalOps.deleteFromChunkStore]] — recipes first, GC second)
  *   - the k-NN graph ([[forgetFromKnnGraph]] — affected nodes recomputed)
  *   - the near-dup cluster assignment ([[forgetClusters]] — affected
  *     components re-closed, splits included)
  *   - a schedule sink's evidence + served manifest ([[forgetFromSchedule]])
  *
  * Scale contract: every face is DELTA-proportional — affected
  * directories are derived from the forgotten docs' OWN keys (their band
  * signatures, their terms, their frames), never by scanning the
  * artifact; the only corpus-sized work is the k-NN re-query of the
  * affected probe rows and the component re-closure of the affected
  * clusters, both bounded by the forgotten ids' blast radius.
  *
  * Correctness contract (the one-truth discipline): after a forget, every
  * artifact's readback must equal a from-scratch rebuild over the corpus
  * WITHOUT the ids — `q_forget_everywhere` gates exactly that diff, per
  * artifact, against the DuckDB-derived expected sizes.
  *
  * Crash ordering: every face is idempotent (anti-joins and overwrites of
  * affected directories; rerunning a forget with already-absent ids
  * rewrites the same survivors), so the recovery story for a crash
  * mid-pass is "rerun the whole forget" — ForgetSpec drives a partial
  * pass and proves the rerun converges. */
object ForgetOps {

  /** Drop `ids` from a [[DedupOps.writeMinHashIndex]] layout. Affected
    * `(band, bucket)` directories are derived by RE-SIGNING the forgotten
    * docs (the caller supplies them with text — a compliance pass holds
    * the payloads it is erasing), so the rewrite reads 1/(bands·buckets)
    * of the index per signature, never the whole artifact. Dynamic
    * partition overwrite + explicit empty-directory cleanup — the
    * [[graft.sources.Storage.deleteIndexAndRewrite]] pattern. */
  def forgetFromLshIndex(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, nHashes: Int = 16, bands: Int = 4,
      nBuckets: Int = 64): Unit = {
    DedupOps.assertLshMeta(spark, path, shingleK, nHashes, bands, nBuckets)
    val keys = DedupOps.bandedWithBucket(docs, idCol, textCol,
        shingleK, nHashes, bands, nBuckets)
      .select(col("band"), col("bucket")).distinct()
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSeq
    rewritePartitions(spark, path,
      keys.map { case (band, bucket) =>
        Seq("band" -> band, "bucket" -> bucket) },
      dropIds = docs.select(col(idCol).as("id")),
      joinCol = "id", sortCols = Seq("id"))
  }

  /** Drop `ids` from a [[MultimodalOps.writePhashIndex]] layout —
    * affected `(band_ix, bucket)` directories derived from the forgotten
    * media's OWN frame hashes. */
  def forgetFromPhashIndex(spark: SparkSession, path: String,
      media: DataFrame, fps: Int = 4, k: Int = 8, nBuckets: Int = 64): Unit = {
    MultimodalOps.assertPhashMeta(spark, path, fps, k, nBuckets)
    val keys = MultimodalOps.bandedPhash(media, fps, k, nBuckets)
      .select(col("band_ix"), col("bucket")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    rewritePartitions(spark, path,
      keys.map { case (bi, b) =>
        Seq("band_ix" -> bi.toString, "bucket" -> b.toString) },
      dropIds = media.select(col("media_id").as("media_id")),
      joinCol = "media_id", sortCols = Seq("media_id", "frame_ix"))
  }

  /** Drop `ids` from a [[graft.operators.RetrievalOps.writePostingsIndex]]
    * (or postingsStream) layout: the affected `pt` directories come from
    * the forgotten docs' OWN terms; every `__batch=` level rewrites only
    * those directories, and the `_docs` length sidecar drops the ids'
    * rows level-by-level (each level is doc-count-slim). */
  def forgetFromPostingsIndex(spark: SparkSession, path: String,
      docs: DataFrame, nPt: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    RetrievalOps.assertPostingsMeta(spark, path, nPt, "forgetFromPostingsIndex")
    val pts = docs
      .select(explode(graft.functions.TextFns.tokens(col(textCol))).as("tok"))
      .select(pmod(xxhash64(col("tok")), lit(nPt.toLong)).cast("int").as("pt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    batchLevels(spark, path).foreach { level =>
      rewritePartitions(spark, level,
        pts.map(pt => Seq("pt" -> pt.toString)),
        dropIds = ids, joinCol = "doc_id", sortCols = Seq("tok", "doc_id"))
    }
    batchLevels(spark, s"$path/_docs").foreach { level =>
      val kept = spark.read.parquet(level)
        .join(ids, Seq("doc_id"), "left_anti").localCheckpoint(true)
      kept.write.mode(SaveMode.Overwrite).parquet(level)
    }
  }

  /** Subtract `docs` from a [[TextOps.writeShingleIndex]] layout by
    * landing a NEGATIVE-count delta level — the streaming sink's own
    * additive algebra, so the forget is delta-sized (the forgotten docs'
    * shingles only) and never touches existing levels. The source tag is
    * derived from the new level id, so [[TextOps.readShingleCounts]]'
    * (shingle, src) replay-dedup can never collapse two distinct forget
    * passes (or a forget with a real batch). Shingles whose corpus count
    * reaches zero vanish at read time (readShingleCounts drops
    * zero-sum rows — a count of zero IS absence).
    *
    * Single-maintainer like every in-place face: run with any
    * shingleIndexStream quiesced — the forget level advances the sink's
    * visible lineage, so a restarting stream below it refuses LOUDLY
    * (requireBatchLineage; never a silent overwrite) and must resume
    * from a fresh checkpoint above the forget level. */
  def forgetFromShingleIndex(spark: SparkSession, path: String,
      docs: DataFrame, k: Int = 3, nPb: Int = 16, hashed: Boolean = true,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    TextOps.assertSpanMeta(spark, path, k, nPb = Some(nPb),
      hashed = Some(hashed))
    val level = batchLevels(spark, path)
      .flatMap(l => "__batch=(-?\\d+)".r.findFirstMatchIn(l).map(_.group(1).toLong))
      .foldLeft(-1L)(math.max) + 1L
    TextOps.shinglePartialCounts(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        k, nPb, hashed, src = -(level + 2L))
      .withColumn("cnt", -col("cnt"))
      .repartition(col("pb"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pb").parquet(s"$path/__batch=$level")
  }

  /** Drop `ids` from a cell-partitioned ANN layout
    * ([[SimilarityOps.writeIvfIndex]] raw vectors or
    * [[SimilarityOps.writeSq8Index]] codes): the affected cell
    * directories are the forgotten vectors' own HOME cells, recomputed
    * from the FROZEN centroids (the persisted-index seed contract — the
    * same centroids every probe and landing uses), so the rewrite reads
    * 1/|cells| of the index per forgotten vector's cell and the result
    * equals a rebuild over the remaining vectors under those centroids
    * row-for-row (assignment and encoding are per-vector deterministic).
    * Probes after the forget can never return a forgotten id — its rows
    * are gone from the only directories that ever held them. */
  def forgetFromCellIndex(spark: SparkSession, path: String,
      vectors: DataFrame, centroids: Seq[(Int, Seq[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    SimilarityOps.assertSq8Meta(spark, path, centroids, "forgetFromCellIndex")
    val vecs = vectors.select(col(idCol).as("id"),
      graft.functions.VectorFns.toDouble(col(vecCol)).as("v"))
    val cells = SimilarityOps.assignCells(vecs, centroids)
      .select(col("cell")).distinct()
      .collect().map(_.get(0).toString).toSeq
    rewritePartitions(spark, path,
      cells.map(c => Seq("cell" -> c)),
      dropIds = vecs.select(col("id")), joinCol = "id", sortCols = Seq("id"))
  }

  /** Forget `ids` from an exact k-NN graph: rows whose PROBE is an id
    * drop; rows that LIST an id as a neighbor are stale (the id may have
    * blocked a live neighbor from the top-k) and their probes re-query
    * the remaining corpus exactly ([[SimilarityOps.batchTopK]] — the same
    * deterministic (sim desc, id) ranking the builder used, so the result
    * equals a from-scratch rebuild row-for-row). Work is
    * delta-proportional: |affected probes| × corpus, never n². */
  def forgetFromKnnGraph(graph: DataFrame, embeddings: DataFrame,
      ids: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // graph rows: (vec_id = the probe, neighbor_id, sim, rank) — the
    // SimilarityOps.knnGraph contract
    val dead = ids.select(col(idCol).cast("long").as("__dead"))
      .localCheckpoint(true)
    val kept = graph
      .join(dead, col(idCol) === col("__dead"), "left_anti")
    val affectedProbes = kept
      .join(dead, col("neighbor_id") === col("__dead"), "left_semi")
      .select(col(idCol)).distinct()
    val untouched = kept.join(affectedProbes, Seq(idCol), "left_anti")
    val remaining = embeddings
      .join(dead, col(idCol) === col("__dead"), "left_anti")
    val requeried = SimilarityOps.batchTopK(
        remaining.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        remaining.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
          .join(affectedProbes.select(col(idCol).as("vec_id")),
            Seq("vec_id"), "left_semi"),
        k)
      .select(col("probe_id").as(idCol), col("vec_id").as("neighbor_id"),
        col("sim"), col("rank").cast("int").as("rank"))
    untouched
      .select(col(idCol), col("neighbor_id"), col("sim"),
        col("rank").cast("int").as("rank"))
      .unionByName(requeried)
  }

  /** Forget `ids` from a near-dup cluster assignment, splits included:
    * components containing an id re-close from the surviving pair list
    * (the caller passes pairs ALREADY excluding the ids — banded pair
    * truths for unrelated docs are unchanged by a delete), every other
    * component keeps its prior labels verbatim. Equal to a from-scratch
    * [[DedupOps.nearDupClustersStar]] over the surviving pairs because
    * labels are canonical min-ids: an untouched component closes to the
    * same labels, and an affected one is recomputed outright. Work is
    * O(affected components' edges), never O(all pairs). */
  def forgetClusters(prior: DataFrame, survivingPairs: DataFrame,
      ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val dead = ids.select(col(idCol).cast("long").as("__dead"))
    val affectedClusters = prior
      .join(dead, col("doc_id") === col("__dead"), "left_semi")
      .select(col("cluster_id")).distinct()
    val keep = prior
      .join(affectedClusters, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
    val members = prior.join(affectedClusters, Seq("cluster_id"), "left_semi")
      .select(col("doc_id"))
    val affectedEdges = survivingPairs
      .join(members, col("id1") === col("doc_id"), "left_semi")
    DedupOps.nearDupClustersStar(affectedEdges).unionByName(keep)
  }

  /** Forget `ids` from a schedule sink ([[graft.streaming.StreamingOps]]'
    * `scheduleBatch` layout — `_docs/__batch=*` evidence +
    * `manifest/__batch=*` served versions): every evidence level drops
    * the ids' rows (evidence FIRST — at any crash point the served
    * manifest is at worst stale, never derived from evidence that still
    * remembers the ids after the pass claims success), then the NEWEST
    * manifest version is re-derived in place from the surviving evidence
    * via the caller's `remanifest` — version numbering is untouched, so
    * the sink's checkpoint lineage stays valid and a later stream replay
    * of that batch re-manifests from the SAME forgotten evidence. */
  def forgetFromSchedule(spark: SparkSession, path: String, ids: DataFrame,
      deltaDDL: String, remanifest: DataFrame => DataFrame): Unit = {
    val dead = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .localCheckpoint(true)
    batchLevels(spark, s"$path/_docs").foreach { level =>
      val kept = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(deltaDDL))
        .parquet(level)
        .join(dead, Seq("doc_id"), "left_anti").localCheckpoint(true)
      kept.write.mode(SaveMode.Overwrite).parquet(level)
    }
    val manifests = batchLevels(spark, s"$path/manifest")
    require(manifests.nonEmpty,
      s"forgetFromSchedule: no served manifest under $path/manifest")
    val newest = manifests.maxBy(l =>
      "__batch=(-?\\d+)".r.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(-1L))
    val dataCols = org.apache.spark.sql.types.StructType.fromDDL(deltaDDL)
      .fieldNames.filterNot(_ == "doc_id").toSeq
    val corpus = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(s"$deltaDDL, __batch LONG"))
      .parquet(s"$path/_docs")
      .groupBy(col("doc_id"))
      .agg(max_by(struct(dataCols.map(col): _*),
        struct((col("__batch") +: dataCols.map(col)): _*)).as("__v"))
      .select(col("doc_id") +: dataCols.map(c => col(s"__v.$c").as(c)): _*)
    remanifest(corpus).localCheckpoint(true)
      .write.mode(SaveMode.Overwrite).parquet(newest)
  }

  /** The `__batch=` level directories under `root` (empty when `root`
    * itself is absent). Sorted for deterministic iteration. */
  private def batchLevels(spark: SparkSession, root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath)
      .filter(_.getName.startsWith("__batch="))
      .map(_.toString).toSeq.sorted
  }

  /** The shared partition-pruned rewrite: read ONLY the named hive
    * partitions, anti-join the ids, dynamic-overwrite them, and delete
    * any partition whose every row was dropped (dynamic overwrite leaves
    * directories it wrote no data for). The
    * [[graft.sources.Storage.deleteIndexAndRewrite]] discipline,
    * generalized over partition schemes. */
  private def rewritePartitions(spark: SparkSession, root: String,
      partitions: Seq[Seq[(String, String)]], dropIds: DataFrame,
      joinCol: String, sortCols: Seq[String]): Unit = {
    if (partitions.isEmpty) return
    val partCols = partitions.head.map(_._1)
    // an index with no data directories (every payload below one frame /
    // shingle) has nothing to rewrite — and schema inference would fail
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val rootFs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!rootFs.exists(rootPath) ||
        !rootFs.listStatus(rootPath).exists(
          _.getPath.getName.startsWith(partCols.head + "="))) return
    val cond = partitions.map(p =>
        p.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))
      .reduce(_ || _)
    val survivors = spark.read.parquet(root).filter(cond)
      .join(dropIds.select(col(joinCol)), Seq(joinCol), "left_anti")
      .localCheckpoint(true)
    val survivorParts: Set[Seq[String]] = survivors
      .select(partCols.map(col): _*).distinct().collect()
      .map(r => partCols.indices.map(i => r.get(i).toString): Seq[String]).toSet
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try survivors
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(partCols: _*).parquet(root)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val conf = spark.sparkContext.hadoopConfiguration
    partitions
      .filterNot(p => survivorParts.contains(p.map(_._2)))
      .foreach { p =>
        val dir = new org.apache.hadoop.fs.Path(
          root + "/" + p.map { case (c, v) => s"$c=$v" }.mkString("/"))
        dir.getFileSystem(conf).delete(dir, true): Unit
      }
  }
}
