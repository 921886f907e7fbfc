package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Token-budget-capped streaming ingest: the admission frontier carries
  * across batches, replay recomputes identically, and a zero-admission
  * batch still lands its frontier row. */
class BudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  // 5 tokens per doc, ids chosen so permutation order within a batch is
  // exercised but the math stays easy: every admitted doc adds 5 tokens
  private def docsOf(ids: Seq[Long]) =
    ids.map(i => (i, "a b c d e")).toDF("doc_id", "text")

  private def admitted(path: String): Map[Long, Long] =
    spark.read.schema("doc_id LONG, sort_key LONG, n_tokens LONG")
      .option("basePath", s"$path/docs").parquet(s"$path/docs")
      .select(col("doc_id"), col("__batch").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("the admission frontier carries across batches and stops at the budget") {
    val path = s"${tmpDir()}/budget"
    // budget 35 tokens = 7 docs: batch0 admits its 4, batch1 admits 3 of
    // its 4 (partial), batch2 admits none
    StreamingOps.budgetBatch(docsOf(1L to 4L), 0L, path, 35L, seed = 0L, nRanges = 4)
    StreamingOps.budgetBatch(docsOf(5L to 8L), 1L, path, 35L, seed = 0L, nRanges = 4)
    StreamingOps.budgetBatch(docsOf(9L to 12L), 2L, path, 35L, seed = 0L, nRanges = 4)
    val got = admitted(path)
    assert(got.size == 7, s"expected 7 admitted docs, got $got")
    assert(got.count(_._2 == 0L) == 4 && got.count(_._2 == 1L) == 3 &&
      !got.values.exists(_ == 2L))
    // the zero-admission batch still landed its frontier row
    val totals = spark.read.schema("admitted_tokens LONG")
      .option("basePath", s"$path/_totals").parquet(s"$path/_totals")
      .select(col("__batch").cast("long"), col("admitted_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals == Map(0L -> 20L, 1L -> 15L, 2L -> 0L), totals)
  }

  test("replay recomputes the same admissions at any crash point") {
    val path = s"${tmpDir()}/budget"
    StreamingOps.budgetBatch(docsOf(1L to 4L), 0L, path, 35L, 0L, 4)
    StreamingOps.budgetBatch(docsOf(5L to 8L), 1L, path, 35L, 0L, 4)
    val before = admitted(path)
    // crash-replay of batch 1: its own landed docs/totals are invisible to
    // the frontier read (__batch < id), so the recompute is identical
    StreamingOps.budgetBatch(docsOf(5L to 8L), 1L, path, 35L, 0L, 4)
    assert(admitted(path) == before, "replay must not change admissions")
  }

  test("an empty micro-batch lands a zero frontier row and changes nothing") {
    val path = s"${tmpDir()}/budget"
    StreamingOps.budgetBatch(docsOf(1L to 4L), 0L, path, 35L, 0L, 4)
    StreamingOps.budgetBatch(docsOf(Seq.empty), 1L, path, 35L, 0L, 4)
    StreamingOps.budgetBatch(docsOf(5L to 8L), 2L, path, 35L, 0L, 4)
    val got = admitted(path)
    assert(got.size == 7 && got.count(_._2 == 2L) == 3, s"frontier broke: $got")
  }

  test("compaction folds committed deltas, preserves the frontier, protects the newest") {
    val path = s"${tmpDir()}/budget"
    StreamingOps.budgetBatch(docsOf(1L to 4L), 0L, path, 35L, 0L, 4)   // 20 tokens
    StreamingOps.budgetBatch(docsOf(5L to 6L), 1L, path, 35L, 0L, 4)   // 10 tokens
    StreamingOps.budgetBatch(docsOf(7L to 8L), 2L, path, 35L, 0L, 4)   // 5 tokens (1 doc), budget hit
    val before = admitted(path).keySet
    StreamingOps.compactBudgetState(spark, path)
    def levels(sub: String) =
      new java.io.File(s"$path/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("__batch=")).toSet
    assert(levels("_totals") == Set("__batch=-1", "__batch=2"), levels("_totals"))
    assert(levels("docs") == Set("__batch=-1", "__batch=2"), levels("docs"))
    assert(admitted(path).keySet == before, "compaction must not change admissions")
    // the newest batch replays over the folded base with the same frontier
    StreamingOps.budgetBatch(docsOf(7L to 8L), 2L, path, 35L, 0L, 4)
    assert(admitted(path).keySet == before, "replay over the base must recompute identically")
    // a further batch reads the folded frontier (35 admitted) and admits nothing
    StreamingOps.budgetBatch(docsOf(9L to 10L), 3L, path, 35L, 0L, 4)
    assert(admitted(path).keySet == before, "the folded frontier must still cap admissions")
  }

  test("frontier is exact in the fold's crash-overlap window (base + undropped delta)") {
    val path = s"${tmpDir()}/budget"
    StreamingOps.budgetBatch(docsOf(1L to 4L), 0L, path, 35L, 0L, 4) // 20 tokens
    StreamingOps.budgetBatch(docsOf(5L to 6L), 1L, path, 35L, 0L, 4) // 10 tokens
    // snapshot batch 0's totals delta, compact (folds it into the base),
    // then restore it — the overlap window foldBatchDirs documents: the
    // same admitted total visible in BOTH the base and the folded delta
    val d0 = new java.io.File(s"$path/_totals/__batch=0")
    val saved = new java.io.File(s"${tmpDir()}/saved_batch0")
    copyDir(d0, saved)
    StreamingOps.compactBudgetState(spark, path)
    copyDir(saved, d0)
    // a naive sum would see 20+20+10 = 50 >= budget and admit nothing;
    // the src-deduped frontier sees 30 and admits exactly one more doc
    StreamingOps.budgetBatch(docsOf(7L to 8L), 2L, path, 35L, 0L, 4)
    assert(admitted(path).count(_._2 == 2L) == 1,
      s"overlap window inflated the frontier: ${admitted(path)}")
  }

  test("frontier is exact in the fold's hide window (base retired, not yet replaced)") {
    val path = s"${tmpDir()}/budget"
    StreamingOps.budgetBatch(docsOf(1L to 4L), 0L, path, 35L, 0L, 4) // 20 tokens
    StreamingOps.budgetBatch(docsOf(5L to 6L), 1L, path, 35L, 0L, 4) // 10 tokens
    StreamingOps.compactBudgetState(spark, path)
    // simulate the crash between base->retired and staging->base: the
    // folded history is visible ONLY inside the _retired leftover
    val base = new java.io.File(s"$path/_totals/__batch=-1")
    assert(base.renameTo(new java.io.File(s"$path/_totals/_retired")))
    // a naive dir listing would see only batch 1's 10 tokens and admit 4
    // more docs; the leftover-aware frontier sees 30 and admits one
    StreamingOps.budgetBatch(docsOf(7L to 10L), 2L, path, 35L, 0L, 4)
    assert(admitted(path).count(_._2 == 2L) == 1,
      s"hide window dropped the folded frontier: ${admitted(path)}")
  }

  test("lineage guard refuses a foreign checkpoint") {
    val path = s"${tmpDir()}/budget"
    StreamingOps.budgetBatch(docsOf(1L to 4L), 3L, path, 35L, 0L, 4)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.budgetBatch(docsOf(5L to 8L), 1L, path, 35L, 0L, 4)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
