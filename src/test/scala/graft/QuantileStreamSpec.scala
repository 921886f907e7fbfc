package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationOps
import graft.streaming.StreamingOps

/** Streaming exact quantiles: the per-batch value histogram merges to
  * the batch exact-quantile truth, under replay, compaction, empty
  * batches, and the lineage guard. */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "lang", "n_chars")

  private val b0 = (1L to 40L).map(i => (i, if (i % 3 == 0) "de" else "en", (i * 37 + 11) % 50))
  private val b1 = (41L to 70L).map(i => (i, if (i % 4 == 0) "de" else "en", (i * 13 + 3) % 80))
  private val b2 = (71L to 80L).map(i => (i, "de", (i * 7) % 30))

  private def truth(rows: Seq[(Long, String, Long)]) =
    CurationOps.exactQuantiles(docsOf(rows), Seq(0.25, 0.5, 0.75))
      .orderBy("lang").collect().map(_.toSeq).toSeq

  test("streamed histogram == batch exact quantiles; replay and empty batches are harmless") {
    val path = s"${tmpDir()}/hist"
    StreamingOps.quantileBatch(docsOf(b0), 0L, path)
    StreamingOps.quantileBatch(docsOf(b1), 1L, path)
    StreamingOps.quantileBatch(docsOf(Seq.empty), 2L, path)
    StreamingOps.quantileBatch(docsOf(b2), 3L, path)
    def read() = StreamingOps.readQuantiles(spark, path, Seq(0.25, 0.5, 0.75))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(read() == truth(b0 ++ b1 ++ b2), s"streamed quantiles diverged: ${read()}")
    StreamingOps.quantileBatch(docsOf(b2), 3L, path) // checkpoint replay
    assert(read() == truth(b0 ++ b1 ++ b2), "replay must not change the histogram")
  }

  test("compaction folds committed deltas (dedup, never sum) and protects the newest") {
    val path = s"${tmpDir()}/hist"
    StreamingOps.quantileBatch(docsOf(b0), 0L, path)
    StreamingOps.quantileBatch(docsOf(b1), 1L, path)
    StreamingOps.quantileBatch(docsOf(b2), 2L, path)
    def read() = StreamingOps.readQuantiles(spark, path, Seq(0.25, 0.5, 0.75))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val before = read()
    StreamingOps.compactQuantileState(spark, path)
    val levels = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("__batch=")).toSet
    assert(levels == Set("__batch=-1", "__batch=2"), levels)
    // a summing fold would double-count every folded batch's values —
    // equality pins the dedup rule
    assert(read() == before, "compaction changed the quantiles")
    StreamingOps.quantileBatch(docsOf(b2), 2L, path) // newest still replayable
    assert(read() == before)
  }

  test("reads are exact in the fold's hide window (histogram visible only in the leftover)") {
    val path = s"${tmpDir()}/hist"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    StreamingOps.quantileBatch(docsOf(b0), 0L, path)
    StreamingOps.quantileBatch(docsOf(b1), 1L, path)
    StreamingOps.compactQuantileState(spark, path)
    require(fs.rename(p(s"$path/__batch=-1"), p(s"$path/_retired")))
    val got = StreamingOps.readQuantiles(spark, path, Seq(0.25, 0.5, 0.75))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(got == truth(b0 ++ b1),
      s"hide window dropped the folded histogram: $got")
  }

  test("lineage guard refuses a foreign checkpoint") {
    val path = s"${tmpDir()}/hist"
    StreamingOps.quantileBatch(docsOf(b0), 4L, path)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.quantileBatch(docsOf(b1), 2L, path)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
