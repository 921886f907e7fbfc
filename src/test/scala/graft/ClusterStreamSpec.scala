package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.streaming.StreamingOps

/** The streaming dedup-clustering loop: multi-batch ingestion produces
  * the same cluster assignment as a single-batch recompute, replay is
  * idempotent (including the stale-own-signatures-in-index case), and
  * the lineage guard refuses a foreign checkpoint. */
class ClusterStreamSpec extends SparkSpec {

  // 1,2 exact dups; 3 near-dup of both; 4,6 unrelated; 5 near-dup of 1
  // arriving in a LATER batch (the cross-batch merge case)
  private def docs() = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "the quick brown fox jumps over the lazy dog by the river"),
      (3L, "the quick brown fox leaps over the lazy dog by the river"),
      (4L, "completely different words about training data pipelines at scale"),
      (5L, "the quick brown fox jumps over the lazy dog by the stream"),
      (6L, "unrelated content about distributed query engines and storage")
    ).toDF("doc_id", "text")
  }

  private def run(dir: String, batches: Seq[Seq[Long]], assignEvery: Int = 1): Unit =
    batches.zipWithIndex.foreach { case (ids, i) =>
      StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(ids: _*)),
        i.toLong, dir, "doc_id", "text", 3, 16, 4, 8, 0.5, assignEvery)
    }

  private def assignment(dir: String): Map[Long, Long] =
    StreamingOps.currentAssignment(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fullTruth(): Map[Long, Long] =
    DedupOps.nearDupClustersStar(
        DedupOps.minHashNearDups(docs(), threshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("three batches converge to the single-batch recompute assignment") {
    val dir = tmpDir()
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L), Seq(5L, 6L)))
    val truth = fullTruth()
    assert(truth.nonEmpty)
    assert(assignment(dir) == truth,
      s"streamed assignment != batch truth ($truth)")
  }

  test("assignEvery=2: sparse checkpoints + live delta fold == recompute at every step") {
    val dir = tmpDir()
    // batches 0,1,2: checkpoints land at 0 and 2 only; batch 1's pairs
    // live as a delta the reader folds on demand
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L)), assignEvery = 2)
    // mid-state: only version 0 exists; currentAssignment folds delta 1
    val midTruth = DedupOps.nearDupClustersStar(
        DedupOps.minHashNearDups(
          docs().filter(col("doc_id").isin(1L, 2L, 3L, 4L)), threshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assignment(dir) == midTruth)
    StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(5L, 6L)),
      2L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5, 2)
    val versions = new java.io.File(s"$dir/_assign").listFiles()
      .map(_.getName).filter(_.startsWith("__batch=")).toSeq.sorted
    assert(versions == Seq("__batch=0", "__batch=2"))
    assert(assignment(dir) == fullTruth())
  }

  test("vacuumClusterState reclaims dead versions; live state and replay survive") {
    val dir = tmpDir()
    // checkpoints at 0 and 2; pair deltas at 0, 1, 2
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L), Seq(5L, 6L)), assignEvery = 2)
    StreamingOps.vacuumClusterState(spark, dir)
    // newest batch = 2, frontier = newest version < 2 = 0: versions < 0
    // none; deltas <= 0 dropped
    def names(sub: String): Seq[String] =
      new java.io.File(s"$dir/$sub").listFiles()
        .map(_.getName).filter(_.startsWith("__batch=")).toSeq.sorted
    assert(names("_assign") == Seq("__batch=0", "__batch=2"))
    assert(names("_pairs") == Seq("__batch=1", "__batch=2"))
    assert(assignment(dir) == fullTruth())
    // replay of the newest batch after vacuum is still bit-identical
    StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(5L, 6L)),
      2L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5, 2)
    assert(assignment(dir) == fullTruth())
    // a later (empty) non-checkpoint batch moves the frontier to 2
    StreamingOps.clusterBatch(docs().filter(col("doc_id") < 0L),
      3L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5, 2)
    StreamingOps.vacuumClusterState(spark, dir)
    assert(names("_assign") == Seq("__batch=2"))
    assert(names("_pairs") == Seq("__batch=3"))
    assert(assignment(dir) == fullTruth())
  }

  test("docs landing is db-bucketed and the rescore corpus read is partition-pruned") {
    val dir = tmpDir()
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L)))
    // layout: every batch dir fans out into db=<id mod 8... nDocBuckets=64>
    val batch0 = new java.io.File(s"$dir/docs/__batch=0").listFiles()
      .map(_.getName).filter(_.startsWith("db=")).toSeq.sorted
    assert(batch0 == Seq("db=1", "db=4"), s"got $batch0")
    // the reader clusterBatch hands to the rescore: a bucket-set filter
    // that reaches the scan as a PartitionFilter (static pruning), and
    // row-equality with the unpruned read for the matching slice
    val corpusFor: Seq[Int] => org.apache.spark.sql.DataFrame = buckets =>
      spark.read.schema("doc_id LONG, text STRING, db INT, __batch LONG")
        .option("basePath", s"$dir/docs").parquet(s"$dir/docs")
        .filter(col("__batch") < 2L && col("db").isin(buckets: _*))
        .select(col("doc_id"), col("text"))
    val pruned = corpusFor(Seq(1, 2))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("db"), s"no pruning:\n$plan")
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("compactClusterDocs folds doc deltas, keeps db layout + newest delta; loop continues") {
    val dir = tmpDir()
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L)))
    StreamingOps.compactClusterDocs(spark, dir)
    def names(sub: String): Seq[String] =
      new java.io.File(s"$dir/$sub").listFiles()
        .map(_.getName).filter(n => n.startsWith("__batch=") || n.startsWith("db=")).toSeq.sorted
    // batch 0 folded into the base; batch 1 (newest — the replayable one)
    // untouched; the base keeps the db bucket dirs
    assert(names("docs") == Seq("__batch=-1", "__batch=1"), s"got ${names("docs")}")
    val base = names("docs/__batch=-1").filterNot(_.startsWith("_"))
    assert(base.nonEmpty && base.forall(_.startsWith("db=")), s"got $base")
    // replay of the newest batch over the compacted base is idempotent
    StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(2L, 3L)),
      1L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5)
    // and the loop continues: a new batch's cross pairs see the full
    // corpus (folded base + delta) — final assignment == batch truth
    StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(5L, 6L)),
      2L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5)
    assert(assignment(dir) == fullTruth())
  }

  test("hide window: a batch over crashed docs/LSH folds heals both stores, keeps cross pairs") {
    val dir = tmpDir()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L)))
    StreamingOps.compactClusterDocs(spark, dir)
    StreamingOps.compactLshIndex(spark, s"$dir/_lsh")
    // crash both folds between base->retired and staging->base: the folded
    // corpus (docs 1, 4) and its signatures are visible only in leftovers
    require(fs.rename(p(s"$dir/docs/__batch=-1"), p(s"$dir/docs/_retired")))
    require(fs.rename(p(s"$dir/_lsh/__batch=-1"), p(s"$dir/_lsh/_retired")))
    // doc 5 is a near-dup of doc 1, which lives ONLY in the hidden bases:
    // without the heal the cross pair is silently dropped from the
    // durable pair delta and the final assignment diverges forever
    StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(5L, 6L)),
      2L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5)
    assert(assignment(dir) == fullTruth(),
      "hidden base dropped a cross pair — assignment diverged from the batch truth")
    // both stores healed before the reads: no leftovers remain
    for (sub <- Seq("docs", "_lsh"); n <- Seq("_retired", "_compacting"))
      assert(!fs.exists(p(s"$dir/$sub/$n")), s"$sub/$n left behind")
  }

  test("a restart with a drifted nDocBuckets refuses (pruning-contract sidecar)") {
    val dir = tmpDir()
    run(dir, Seq(Seq(1L, 4L)))
    val e = intercept[IllegalArgumentException] {
      StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(2L, 3L)),
        1L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5, 1, nDocBuckets = 16)
    }
    assert(e.getMessage.contains("nDocBuckets"))
    // the recorded parameter still works
    StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(2L, 3L)),
      1L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5)
    assert(assignment(dir).nonEmpty)
  }

  test("property: random batch splits x random cadence all converge to the recompute truth") {
    val rnd = new scala.util.Random(42)
    val truth = fullTruth()
    (1 to 3).foreach { trial =>
      val dir = tmpDir()
      // random partition of the six docs into 2-3 non-empty batches
      val shuffled = rnd.shuffle((1L to 6L).toList)
      val nBatches = 2 + rnd.nextInt(2)
      val batches = shuffled.grouped(math.ceil(6.0 / nBatches).toInt).toSeq
      val cadence = 1 + rnd.nextInt(3)
      run(dir, batches, assignEvery = cadence)
      assert(assignment(dir) == truth,
        s"trial $trial: batches=$batches cadence=$cadence diverged")
    }
  }

  test("checkpoint replay of the newest batch is idempotent") {
    val dir = tmpDir()
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L), Seq(5L, 6L)))
    val before = assignment(dir)
    // replay: the index already holds batch 2's signatures; the corpus
    // frontier (__batch < 2) must keep them from producing phantom pairs
    StreamingOps.clusterBatch(docs().filter(col("doc_id").isin(5L, 6L)),
      2L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5)
    assert(assignment(dir) == before)
    assert(assignment(dir) == fullTruth())
  }

  test("clusterBatch refuses a sink written by a different checkpoint lineage") {
    val dir = tmpDir()
    run(dir, Seq(Seq(1L, 4L), Seq(2L, 3L)))
    val e = intercept[IllegalArgumentException] {
      StreamingOps.clusterBatch(docs().filter(col("doc_id") === 5L),
        0L, dir, "doc_id", "text", 3, 16, 4, 8, 0.5)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
