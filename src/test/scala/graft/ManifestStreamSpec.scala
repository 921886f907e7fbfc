package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AssemblyOps
import graft.streaming.StreamingOps

/** Streaming UniMax-scheduled training manifest — the periodic-re-manifest
  * contract (docs/ROUND12's closing note, mandated by the r13 verdict):
  * global waterfilling is not delta-maintainable, so each batch lands only
  * the slim (id, source, n_tokens) delta and every refreshEvery-th batch
  * recomputes the FULL manifest from the accumulated counts. The served
  * manifest must equal the batch trainManifest of the corpus as of its
  * version; between refreshes it is intentionally stale by < refreshEvery
  * batches. Oracle row: q_stream_manifest (shares g_train_manifest's
  * truth). */
class ManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Budget = 3000L
  private val Cap = 3
  private val L = 32L

  private def docs(ids: Range): DataFrame = {
    val rnd = new scala.util.Random(41)
    val all = (0L until 80L).map { i =>
      (i, s"src${rnd.nextInt(4)}",
        Seq.fill(1 + rnd.nextInt(18))(s"w${rnd.nextInt(7)}").mkString(" "))
    }
    ids.map(i => all(i)).toDF("doc_id", "source", "text")
  }

  private def batch(ids: Range, id: Long, path: String, refreshEvery: Int = 1): Unit =
    StreamingOps.manifestBatch(docs(ids), id, path, Budget, Cap, L,
      refreshEvery, 0L, 64, "source", "doc_id", "text")

  private def served(path: String): Seq[(Long, Long, Long, String, Long, Long, Long)] =
    StreamingOps.readTrainManifest(spark, path)
      .as[(Long, Long, Long, String, Long, Long, Long)].collect().toSeq.sorted

  private def truth(ids: Range): Seq[(Long, Long, Long, String, Long, Long, Long)] =
    truthOf(docs(ids))

  private def truthOf(d: DataFrame): Seq[(Long, Long, Long, String, Long, Long, Long)] =
    AssemblyOps.trainManifest(d, Budget, Cap, L)
      .as[(Long, Long, Long, String, Long, Long, Long)].collect().toSeq.sorted

  test("counts-based trainManifest == text-based trainManifest") {
    // the seam the refresh rides on: allocation/expansion/packing from a
    // precomputed n_tokens column is bit-equal to tokenizing text
    val slim = docs(0 until 60).selectExpr("doc_id", "source",
      "CAST(size(split(coalesce(text, ''), ' ')) AS LONG) AS n_tokens")
    val fromCounts = AssemblyOps.trainManifest(slim, Budget, Cap, L,
        textCol = "n_tokens", nTokensCol = Some("n_tokens"))
      .as[(Long, Long, Long, String, Long, Long, Long)].collect().toSeq.sorted
    assert(fromCounts == truth(0 until 60))
  }

  test("served manifest == batch trainManifest as of each refresh; replay overwrites") {
    val p = s"${tmpDir()}/m"
    batch(0 until 25, 0L, p)
    assert(served(p) == truth(0 until 25))
    batch(25 until 45, 1L, p)
    assert(served(p) == truth(0 until 45))
    batch(45 until 60, 2L, p)
    assert(served(p) == truth(0 until 60))
    // checkpoint replay of the newest batch overwrites, never duplicates
    batch(45 until 60, 2L, p)
    assert(served(p) == truth(0 until 60))
  }

  test("refreshEvery: skipped batches land deltas only, serving stays at the last version") {
    val p = s"${tmpDir()}/m"
    batch(0 until 20, 0L, p, refreshEvery = 2)
    val v0 = served(p)
    assert(v0 == truth(0 until 20))
    // batch 1: delta lands, NO refresh — serving intentionally stale
    batch(20 until 40, 1L, p, refreshEvery = 2)
    assert(served(p) == v0)
    def versions = new java.io.File(s"$p/manifest").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(versions == Seq("__batch=0"))
    // batch 2 refreshes over ALL accumulated deltas, including batch 1's
    batch(40 until 60, 2L, p, refreshEvery = 2)
    assert(versions == Seq("__batch=0", "__batch=2"))
    assert(served(p) == truth(0 until 60))
  }

  test("lineage refusal on both roots; schedule-parameter drift refused") {
    val p = s"${tmpDir()}/m"
    batch(0 until 10, 5L, p)
    val e = intercept[IllegalArgumentException] { batch(10 until 20, 0L, p) }
    assert(e.getMessage.contains("different checkpoint lineage"))
    // crash window: _docs delta landed, manifest not — a foreign
    // checkpoint below the orphan must refuse on the _docs root alone
    val p2 = s"${tmpDir()}/m2"
    batch(0 until 10, 0L, p2, refreshEvery = 2) // version 0 exists
    batch(10 until 20, 1L, p2, refreshEvery = 2) // delta only (no refresh)
    val e2 = intercept[IllegalArgumentException] {
      batch(10 until 20, 0L, p2, refreshEvery = 2)
    }
    assert(e2.getMessage.contains("different checkpoint lineage"))
    // drifted budget silently changes the whole schedule — refuse, named
    val e3 = intercept[IllegalArgumentException] {
      StreamingOps.manifestBatch(docs(20 until 30), 2L, p2, Budget + 1, Cap, L,
        2, 0L, 64, "source", "doc_id", "text")
    }
    assert(e3.getMessage.contains("schedule parameter mismatch"))
  }

  test("compaction folds deltas latest-wins (newest protected); vacuum prunes versions") {
    val p = s"${tmpDir()}/m"
    batch(0 until 25, 0L, p)
    batch(25 until 45, 1L, p)
    batch(45 until 60, 2L, p)
    StreamingOps.compactManifestState(spark, p)
    def dirs(sub: String) = new java.io.File(s"$p/$sub").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    // all deltas but the protected newest folded into the base
    assert(dirs("_docs") == Seq("__batch=-1", "__batch=2"))
    assert(served(p) == truth(0 until 60))
    // a refresh over the folded layout recomputes the identical manifest
    batch(45 until 60, 2L, p)
    assert(served(p) == truth(0 until 60))
    // vacuum: keepVersions newest survive, serving unchanged
    assert(dirs("manifest") == Seq("__batch=0", "__batch=1", "__batch=2"))
    StreamingOps.vacuumScheduleManifests(spark, p, keepVersions = 2)
    assert(dirs("manifest") == Seq("__batch=1", "__batch=2"))
    StreamingOps.vacuumScheduleManifests(spark, p)
    assert(dirs("manifest") == Seq("__batch=2"))
    assert(served(p) == truth(0 until 60))
    intercept[IllegalArgumentException] {
      StreamingOps.vacuumScheduleManifests(spark, p, keepVersions = 0)
    }
  }

  test("a re-emitted doc is an evidence UPDATE: latest wins, across the fold") {
    val p = s"${tmpDir()}/m"
    batch(0 until 20, 0L, p)
    // re-crawl: docs 0..9 re-emitted with CHANGED text (more tokens) — the
    // refresh must reflect exactly the newest evidence, never a
    // column-wise mix of the two versions
    val re = docs(0 until 10)
      .withColumn("text", concat(col("text"), lit(" tail tail tail")))
    StreamingOps.manifestBatch(re, 1L, p, Budget, Cap, L, 1, 0L, 64,
      "source", "doc_id", "text")
    val cur = re.unionByName(docs(10 until 20))
    assert(served(p) == truthOf(cur))
    // the fold (old version in base, new in a delta) preserves the winner
    StreamingOps.compactManifestState(spark, p)
    batch(20 until 30, 2L, p)
    assert(served(p) == truthOf(cur.unionByName(docs(20 until 30))))
  }

  test("refresh heals a crashed fold before deriving the manifest") {
    val p = s"${tmpDir()}/m"
    batch(0 until 25, 0L, p)
    batch(25 until 45, 1L, p)
    batch(45 until 60, 2L, p)
    StreamingOps.compactManifestState(spark, p)
    // crash window: base retired, staging install never happened — the
    // folded history is visible ONLY inside the _retired leftover
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    require(fs.rename(hp(s"$p/_docs/__batch=-1"), hp(s"$p/_docs/_retired")))
    // the next refresh heals first, so the manifest sees the FULL corpus
    batch(60 until 80, 3L, p)
    assert(served(p) == truth(0 until 80))
    assert(!fs.exists(hp(s"$p/_docs/_retired")) &&
      !fs.exists(hp(s"$p/_docs/_compacting")))
  }

  test("empty sink serves an empty, correctly-typed manifest") {
    val p = s"${tmpDir()}/empty"
    val m = StreamingOps.readTrainManifest(spark, p)
    assert(m.isEmpty)
    assert(m.columns.toSeq ==
      Seq("seq_id", "seq_pos", "doc_id", "source", "epoch", "doc_start", "len"))
  }

  // --- crash-partial manifest versions: the _SUCCESS completeness contract

  /** Plant a crash-partial newest version: the directory exists (the v1
    * committer creates it before job-commit) but carries no _SUCCESS —
    * only a _temporary residue, exactly the crash-before-commit window. */
  private def plantPartial(p: String, id: Long): Unit = {
    val d = new java.io.File(s"$p/manifest/__batch=$id/_temporary/0")
    require(d.mkdirs(), s"couldn't plant partial at $d")
  }

  private def versionsOf(p: String): Seq[String] =
    new java.io.File(s"$p/manifest").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted

  test("reader skips a crash-partial newest version, serves the last complete one") {
    val p = s"${tmpDir()}/m"
    batch(0 until 25, 0L, p)
    batch(25 until 45, 1L, p)
    // crash: version 2's dir appeared but job-commit never ran
    plantPartial(p, 2L)
    // a reader mid-crash-window must get version 1, not an empty frame
    assert(served(p) == truth(0 until 45))
    // the stream replays batch 2 after restart; serving moves forward
    batch(45 until 60, 2L, p)
    assert(served(p) == truth(0 until 60))
  }

  test("vacuum keeps the crash-partial newest AND the last complete version") {
    val p = s"${tmpDir()}/m"
    batch(0 until 25, 0L, p)
    batch(25 until 45, 1L, p)
    plantPartial(p, 2L)
    StreamingOps.vacuumScheduleManifests(spark, p, keepVersions = 1)
    // the marker-less newest must not displace version 1 (the only
    // complete one a reader can serve) out of the keep window; version 0
    // is strictly below the kept-complete floor and goes
    assert(versionsOf(p) == Seq("__batch=1", "__batch=2"))
    assert(served(p) == truth(0 until 45))
    // an OLDER crashed partial sits below the floor and is pruned
    plantPartial(p, -5L)
    StreamingOps.vacuumScheduleManifests(spark, p, keepVersions = 1)
    assert(versionsOf(p) == Seq("__batch=1", "__batch=2"))
  }

  test("all-partials sink: vacuum deletes nothing, reader serves empty") {
    val p = s"${tmpDir()}/m"
    plantPartial(p, 0L)
    plantPartial(p, 1L)
    StreamingOps.vacuumScheduleManifests(spark, p, keepVersions = 1)
    assert(versionsOf(p) == Seq("__batch=0", "__batch=1"))
    val m = StreamingOps.readTrainManifest(spark, p)
    assert(m.isEmpty)
  }

  test("observePins captures a pinned subplan's executed plan") {
    import graft.operators.Checkpoints
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val df = docs(0 until 5)
    val out = Checkpoints.observePins(plan => seen += plan) {
      Checkpoints.pin(df, reliable = false)
    }
    assert(out.count() == 5)
    assert(seen.size == 1 && seen.head.nonEmpty)
    // outside an audit, pin reports nothing
    Checkpoints.pin(df, reliable = false)
    assert(seen.size == 1)
  }
}
