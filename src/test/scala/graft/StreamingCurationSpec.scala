package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** Streaming curated landing: paragraphs are admitted corpus-wide exactly
  * once ACROSS micro-batches and ACROSS runs — the persisted paragraph-key
  * index carries the dedup frontier, so a paragraph admitted in run 1
  * blocks its recurrence in run 2 without re-reading run 1's text. The
  * batch-id-derived layout makes every micro-batch idempotent under
  * checkpoint replay (no content loss, no duplicate doc rows at any crash
  * point), the index is pb-bucketed so per-batch corpus reads prune to the
  * touched directories, and compactParaIndex folds the per-batch deltas. */
class StreamingCurationSpec extends SparkSpec {

  private def keys(out: String): Set[Long] =
    spark.read.parquet(s"$out/_para_index").select("__k")
      .distinct().collect().map(_.getLong(0)).toSet

  private def landed(out: String) = spark.read.parquet(s"$out/docs").collect()
    .map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))))
    .toMap

  test("curatedIngest admits each paragraph once across batches and runs") {
    import spark.implicits._
    val dir = tmpDir()
    val land = s"$dir/docs_in"; val out = s"$dir/curated"; val ckpt = s"$dir/ckpt"

    def run(): Unit = {
      val schema = spark.read.parquet(land).schema
      val src = spark.readStream.schema(schema).parquet(land)
      val q = StreamingOps.curatedIngest(src, out, ckpt, chunkSize = 4)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: doc 1 = paragraphs P, Q; doc 2 repeats P in-batch and adds R
    Seq(
      (1L, "p1 p2 p3 p4 q1 q2 q3 q4"),
      (2L, "p1 p2 p3 p4 r1 r2 r3 r4")
    ).toDF("doc_id", "text").write.parquet(land)
    run()
    assert(landed(out) == Map(
      1L -> (("p1 p2 p3 p4 q1 q2 q3 q4", 2L, 0L)),
      2L -> (("r1 r2 r3 r4", 1L, 1L)))) // P lost to doc 1 inside the batch
    assert(keys(out).size == 3) // P, Q, R admitted

    // run 2: doc 3 repeats Q (admitted LAST run — only the index knows)
    // and adds S; the checkpoint ensures run 1's files are not reprocessed
    Seq((3L, "q1 q2 q3 q4 s1 s2 s3 s4")).toDF("doc_id", "text")
      .write.mode("append").parquet(land)
    run()
    val all = landed(out)
    assert(all.keySet == Set(1L, 2L, 3L)) // no duplicate doc rows
    assert(all(3L) == (("s1 s2 s3 s4", 1L, 1L))) // Q blocked by the index
    assert(keys(out).size == 4)
  }

  test("curatedBatch replay is idempotent at every crash point") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def del(p: String) = fs.delete(new org.apache.hadoop.fs.Path(p), true)

    val b0 = Seq(
      (1L, "p1 p2 p3 p4 q1 q2 q3 q4"),
      (2L, "p1 p2 p3 p4 r1 r2 r3 r4")).toDF("doc_id", "text")
    StreamingOps.curatedBatch(b0, 0L, out, chunkSize = 4, nPb = 8)
    val docs0 = landed(out); val keys0 = keys(out)
    assert(keys0.size == 3)

    // crash after checkpoint-commit failure: full re-execution of batch 0
    StreamingOps.curatedBatch(b0, 0L, out, chunkSize = 4, nPb = 8)
    assert(landed(out) == docs0 && keys(out) == keys0)

    // crash between the docs write and the index write: replay recomputes
    // the SAME admissions (corpus read takes __batch < 0 only) — this is
    // the window that lost the batch's text under the append-based layout
    del(s"$out/_para_index/__batch=0")
    StreamingOps.curatedBatch(b0, 0L, out, chunkSize = 4, nPb = 8)
    assert(landed(out) == docs0 && keys(out) == keys0)

    // crash mid-docs-write: replay overwrites the partial landing
    del(s"$out/docs/__batch=0")
    StreamingOps.curatedBatch(b0, 0L, out, chunkSize = 4, nPb = 8)
    assert(landed(out) == docs0 && keys(out) == keys0)

    // the frontier survives it all: batch 1 dedups against batch 0
    val b1 = Seq((3L, "q1 q2 q3 q4 s1 s2 s3 s4")).toDF("doc_id", "text")
    StreamingOps.curatedBatch(b1, 1L, out, chunkSize = 4, nPb = 8)
    assert(landed(out)(3L) == (("s1 s2 s3 s4", 1L, 1L)))
    assert(keys(out).size == 4)
  }

  test("curatedBatch refuses an outDir written by a different checkpoint lineage") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    val b = Seq((1L, "p1 p2 p3 p4")).toDF("doc_id", "text")
    StreamingOps.curatedBatch(b, 3L, out, chunkSize = 4, nPb = 8)
    // a FRESH checkpoint restarts batch ids at 0 — proceeding would clobber
    // batch 3's directories and dedup against a wrong frontier
    val e = intercept[IllegalArgumentException] {
      StreamingOps.curatedBatch(b, 0L, out, chunkSize = 4, nPb = 8)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
    // the rightful lineage continues: replay of 3 and the next batch work
    StreamingOps.curatedBatch(b, 3L, out, chunkSize = 4, nPb = 8)
    StreamingOps.curatedBatch(b, 4L, out, chunkSize = 4, nPb = 8)
    assert(landed(out).keySet == Set(1L))
  }

  test("para index is pb-bucketed and point probes prune to one directory") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    val docs = (1L to 40L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d")).toDF("doc_id", "text")
    StreamingOps.curatedBatch(docs, 0L, out, chunkSize = 4, nPb = 8)
    val idx = s"$out/_para_index"
    // layout: __batch=0/pb=* directories
    val pbDirs = new java.io.File(s"$idx/__batch=0").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("pb="))
    assert(pbDirs.length > 1)
    val pb = pbDirs.head.getName.stripPrefix("pb=").toInt
    val probe = spark.read.parquet(idx).filter(col("pb") === pb)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pb"),
      s"no pb partition filter:\n$plan")
    val probed = probe.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty && probed.forall(_.contains(s"pb=$pb")))
  }

  test("compactParaIndex folds deltas, survives crash leftovers, tolerates overlap") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val idx = s"$out/_para_index"

    StreamingOps.curatedBatch(
      Seq((1L, "p1 p2 p3 p4 q1 q2 q3 q4")).toDF("doc_id", "text"), 0L, out, 4, 8)
    StreamingOps.curatedBatch(
      Seq((2L, "p1 p2 p3 p4 r1 r2 r3 r4")).toDF("doc_id", "text"), 1L, out, 4, 8)
    val keysBefore = keys(out)
    assert(keysBefore.size == 3)
    assert(new java.io.File(idx).listFiles().count(_.getName.startsWith("__batch=")) == 2)

    StreamingOps.compactParaIndex(spark, out)
    val dirs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("__batch="))
    // the NEWEST delta is protected (batch 1 may still checkpoint-replay);
    // everything below it is folded into the base
    assert(dirs.map(_.getName).toSeq.sorted == Seq("__batch=-1", "__batch=1"))
    // one file per pb directory — the small-file pile is folded
    for (d <- new java.io.File(s"$idx/__batch=-1").listFiles() if d.getName.startsWith("pb="))
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(keys(out) == keysBefore)

    // a second compaction with nothing foldable is a no-op (no base churn)
    val baseMtime = new java.io.File(s"$idx/__batch=-1").lastModified()
    StreamingOps.compactParaIndex(spark, out)
    assert(new java.io.File(s"$idx/__batch=-1").lastModified() == baseMtime)

    // crash window: base retired but staging not yet installed — a rerun
    // unions the invisible directories back in and restores the base
    require(fs.rename(p(s"$idx/__batch=-1"), p(s"$idx/_retired")))
    StreamingOps.compactParaIndex(spark, out)
    assert(keys(out) == keysBefore)
    assert(!fs.exists(p(s"$idx/_retired")) && !fs.exists(p(s"$idx/_compacting")))

    // overlap window: base installed, a folded delta not yet dropped —
    // duplicate keys must neither re-admit a paragraph nor multiply doc rows
    org.apache.hadoop.fs.FileUtil.copy(
      fs, p(s"$idx/__batch=-1"), fs, p(s"$idx/__batch=0"), false, conf)
    StreamingOps.curatedBatch(
      Seq((3L, "q1 q2 q3 q4 s1 s2 s3 s4")).toDF("doc_id", "text"), 2L, out, 4, 8)
    val all = landed(out)
    assert(all.keySet == Set(1L, 2L, 3L)) // exactly one row per doc
    assert(all(3L) == (("s1 s2 s3 s4", 1L, 1L)))
  }

  test("hide window: a batch landing over a crashed fold heals the index, no re-admission") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val idx = s"$out/_para_index"

    StreamingOps.curatedBatch(
      Seq((1L, "p1 p2 p3 p4 q1 q2 q3 q4")).toDF("doc_id", "text"), 0L, out, 4, 8)
    StreamingOps.curatedBatch(
      Seq((2L, "r1 r2 r3 r4")).toDF("doc_id", "text"), 1L, out, 4, 8)
    StreamingOps.compactParaIndex(spark, out) // P, Q folded into the base
    // crash between base->retired and staging->base: the folded keys are
    // visible ONLY in the leftover, and the MAINTAINER does not come back
    // — the stream resumes on its own
    require(fs.rename(p(s"$idx/__batch=-1"), p(s"$idx/_retired")))
    // batch 2 repeats Q: without the heal the corpus read misses the
    // hidden base and re-admits it — duplicate content landing DURABLY
    StreamingOps.curatedBatch(
      Seq((3L, "q1 q2 q3 q4 s1 s2 s3 s4")).toDF("doc_id", "text"), 2L, out, 4, 8)
    val all = landed(out)
    assert(all(3L) == (("s1 s2 s3 s4", 1L, 1L)),
      s"hidden base was not healed — paragraph re-admitted: ${all(3L)}")
    // the batch healed the layout before reading: no leftovers remain
    assert(!fs.exists(p(s"$idx/_retired")) && !fs.exists(p(s"$idx/_compacting")))
    assert(keys(out).size == 4)
  }

  test("compactCuratedDocs folds doc deltas, keeps the newest, converges after a crash") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val docsDir = s"$out/docs"

    val b2 = Seq((3L, "q1 q2 q3 q4 s1 s2 s3 s4")).toDF("doc_id", "text")
    StreamingOps.curatedBatch(
      Seq((1L, "p1 p2 p3 p4 q1 q2 q3 q4")).toDF("doc_id", "text"), 0L, out, 4, 8)
    StreamingOps.curatedBatch(
      Seq((2L, "p1 p2 p3 p4 r1 r2 r3 r4")).toDF("doc_id", "text"), 1L, out, 4, 8)
    StreamingOps.curatedBatch(b2, 2L, out, 4, 8)
    val docsBefore = landed(out)

    StreamingOps.compactCuratedDocs(spark, out)
    // batches 0 and 1 folded into the base; batch 2 (may replay) survives
    val dirs = new java.io.File(docsDir).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs == Seq("__batch=-1", "__batch=2"))
    assert(landed(out) == docsBefore)

    // the protected newest delta replays onto its own directory: no dup rows
    StreamingOps.curatedBatch(b2, 2L, out, 4, 8)
    assert(landed(out) == docsBefore)

    // overlap window: base installed but a folded delta not yet dropped —
    // readers see duplicate doc rows until a rerun converges the directory
    org.apache.hadoop.fs.FileUtil.copy(
      fs, p(s"$docsDir/__batch=-1"), fs, p(s"$docsDir/__batch=0"), false, conf)
    StreamingOps.curatedBatch(Seq((4L, "t1 t2 t3 t4")).toDF("doc_id", "text"), 3L, out, 4, 8)
    StreamingOps.compactCuratedDocs(spark, out)
    val rows = spark.read.parquet(docsDir).groupBy("doc_id").count().collect()
    assert(rows.forall(_.getLong(1) == 1L)) // converged: one row per doc
    assert(landed(out).keySet == Set(1L, 2L, 3L, 4L))

    // crash window: base retired, staging not installed — rerun recovers
    require(fs.rename(p(s"$docsDir/__batch=-1"), p(s"$docsDir/_retired")))
    StreamingOps.compactCuratedDocs(spark, out)
    assert(landed(out).keySet == Set(1L, 2L, 3L, 4L))
    assert(!fs.exists(p(s"$docsDir/_retired")) && !fs.exists(p(s"$docsDir/_compacting")))
  }

  test("compaction never folds the newest delta: a checkpoint replay keeps its text") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    // batch 0 admits P,Q; batch 1 admits R (Q blocked by the index); then
    // the stream dies AFTER batch 1's writes but BEFORE its checkpoint
    // commit — so batch 1 WILL replay on restart
    val b1 = Seq((2L, "q1 q2 q3 q4 r1 r2 r3 r4")).toDF("doc_id", "text")
    StreamingOps.curatedBatch(
      Seq((1L, "p1 p2 p3 p4 q1 q2 q3 q4")).toDF("doc_id", "text"), 0L, out, 4, 8)
    StreamingOps.curatedBatch(b1, 1L, out, 4, 8)
    val docsBefore = landed(out)
    assert(docsBefore(2L) == (("r1 r2 r3 r4", 1L, 1L)))

    // operator compacts while the stream is down (allowed by the contract)
    StreamingOps.compactParaIndex(spark, out)
    // batch 1's delta must have survived under its own id: were it folded
    // into the base, the replay below would read its own R keys as prior
    // corpus and land doc 2 with EMPTY text — permanent content loss
    assert(new java.io.File(s"$out/_para_index/__batch=1").exists())

    // restart: checkpoint replays batch 1; the landing must be unchanged
    StreamingOps.curatedBatch(b1, 1L, out, 4, 8)
    assert(landed(out) == docsBefore)
    assert(keys(out).size == 3)
  }

  test("forgetFromCuratedLanding purges admitted keys + docs; forgotten content re-admits") {
    import spark.implicits._
    val out = s"${tmpDir()}/curated"
    // batch 0: doc 1 = A,B; doc 2 = A,C (A lost to doc 1 inside the batch)
    StreamingOps.curatedBatch(Seq(
        (1L, "a1 a2 a3 a4 b1 b2 b3 b4"),
        (2L, "a1 a2 a3 a4 c1 c2 c3 c4")).toDF("doc_id", "text"),
      0L, out, 4, 8)
    // batch 1: doc 3 repeats B (blocked by the index), adds D
    StreamingOps.curatedBatch(Seq(
        (3L, "b1 b2 b3 b4 d1 d2 d3 d4")).toDF("doc_id", "text"),
      1L, out, 4, 8)
    assert(keys(out).size == 4) // A, B, C, D
    // forget doc 1 — ids-only by nature (the landing holds the payload):
    // its ADMITTED keys are A and B (its landed clean_text), NOT C
    graft.operators.ForgetOps.forgetFromCuratedLanding(spark, out,
      Seq(1L).toDF("doc_id"), chunkSize = 4, nPb = 8)
    assert(landed(out).keySet == Set(2L, 3L))
    assert(keys(out).size == 2) // C, D survive
    // a stale checkpoint replaying batch 1 hits the lineage fence instead
    // of resurrecting doc 1's keys from its own rewritten level
    val e = intercept[IllegalArgumentException](
      StreamingOps.curatedBatch(
        Seq((3L, "b1 b2 b3 b4 d1 d2 d3 d4")).toDF("doc_id", "text"),
        1L, out, 4, 8))
    assert(e.getMessage.contains("different checkpoint lineage"))
    // the live stream's NEXT batch re-sends A and B from a surviving
    // source: both RE-ADMIT (their only admitter was forgotten), exactly
    // like a rebuild over the surviving corpus would admit them
    StreamingOps.curatedBatch(Seq(
        (9L, "a1 a2 a3 a4 b1 b2 b3 b4")).toDF("doc_id", "text"),
      2L, out, 4, 8)
    assert(landed(out)(9L) == (("a1 a2 a3 a4 b1 b2 b3 b4", 2L, 0L)))
    assert(keys(out).size == 4) // A, B back beside C, D
    // a drifted forget refuses via the landing's parameter sidecar
    val e2 = intercept[IllegalArgumentException](
      graft.operators.ForgetOps.forgetFromCuratedLanding(spark, out,
        Seq(2L).toDF("doc_id"), chunkSize = 8, nPb = 8))
    assert(e2.getMessage.contains("curated-landing parameters"))
    // rerunning the SAME forget converges (doc rows already gone -> no
    // keys derived -> faces no-op, fences advance)
    graft.operators.ForgetOps.forgetFromCuratedLanding(spark, out,
      Seq(1L).toDF("doc_id"), chunkSize = 4, nPb = 8)
    assert(keys(out).size == 4)
    assert(landed(out).keySet == Set(2L, 3L, 9L))
  }
}
