package graft

import org.apache.spark.sql.DataFrame
import graft.operators.AssemblyOps
import graft.streaming.StreamingOps

/** Streaming curriculum manifest — the second global-schedule maintainer
  * (corpus-wide rank buckets move with every batch, like the UniMax water
  * level): slim (id, score, n_tokens) deltas per batch, full re-rank +
  * re-pack on refresh, latest-wins serving. Oracle row:
  * q_stream_curriculum (shares g_curriculum's truth). */
class CurriculumStreamSpec extends SparkSpec {
  import spark.implicits._

  private val L = 32L
  private val B = 4

  private def docs(ids: Range): DataFrame = {
    val rnd = new scala.util.Random(59)
    val all = (0L until 60L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(14))(s"w${rnd.nextInt(9)}").mkString(" "))
    }
    ids.map(i => all(i)).toDF("doc_id", "text")
  }

  private def batch(ids: Range, id: Long, path: String, every: Int = 1): Unit =
    StreamingOps.curriculumBatch(docs(ids), id, path, B, L, every, 0L, 64L,
      "doc_id", "text")

  private def served(path: String): Seq[(Long, Long, Long, Long, Long, Long)] =
    StreamingOps.readCurriculumManifest(spark, path)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted

  private def truth(ids: Range): Seq[(Long, Long, Long, Long, Long, Long)] =
    AssemblyOps.curriculumManifest(docs(ids), B, L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted

  test("served == batch curriculumManifest as of each refresh; replay overwrites") {
    val p = s"${tmpDir()}/c"
    batch(0 until 25, 0L, p)
    assert(served(p) == truth(0 until 25))
    batch(25 until 60, 1L, p)
    assert(served(p) == truth(0 until 60))
    batch(25 until 60, 1L, p) // replay
    assert(served(p) == truth(0 until 60))
  }

  test("refreshEvery staleness + drift refusal + lineage on both roots") {
    val p = s"${tmpDir()}/c"
    batch(0 until 20, 0L, p, every = 2)
    val v0 = served(p)
    batch(20 until 40, 1L, p, every = 2) // delta only
    assert(served(p) == v0)
    batch(40 until 60, 2L, p, every = 2)
    assert(served(p) == truth(0 until 60))
    val e = intercept[IllegalArgumentException] {
      StreamingOps.curriculumBatch(docs(0 until 5), 3L, p, B + 1, L, 2, 0L,
        64L, "doc_id", "text")
    }
    assert(e.getMessage.contains("schedule parameter mismatch"))
    val e2 = intercept[IllegalArgumentException] { batch(0 until 5, 0L, p) }
    assert(e2.getMessage.contains("different checkpoint lineage"))
  }

  test("compaction folds deltas (newest protected); vacuum prunes; serving unchanged") {
    val p = s"${tmpDir()}/c"
    batch(0 until 25, 0L, p)
    batch(25 until 45, 1L, p)
    batch(45 until 60, 2L, p)
    StreamingOps.compactCurriculumState(spark, p)
    def dirs(sub: String) = new java.io.File(s"$p/$sub").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs("_docs") == Seq("__batch=-1", "__batch=2"))
    assert(served(p) == truth(0 until 60))
    // a refresh over the folded layout recomputes the identical manifest
    batch(45 until 60, 2L, p)
    assert(served(p) == truth(0 until 60))
    StreamingOps.vacuumScheduleManifests(spark, p)
    assert(dirs("manifest") == Seq("__batch=2"))
    assert(served(p) == truth(0 until 60))
  }
}
