package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.StreamingOps

/** Streaming shingle-count index maintenance: micro-batches land
  * source-tagged partial counts, probes final-merge them to the exact
  * union occurrence count, checkpoint replay never double-counts,
  * the parameter sidecar rejects a drifted restart, and
  * compactShingleIndex folds committed deltas WITHOUT summing. */
class SpanIndexSpec extends SparkSpec {

  // corpus docs 1,2 share an 8+-token run (cross-doc dup); corpus doc 5
  // shares a 10-token run with increment doc 6 only (the incremental
  // case); docs 4,7 are noise
  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta one two"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta three four"),
      (4L, "totally unrelated content with no repeats anywhere at all"),
      (5L, "shared run lives here spanning exactly eight tokens yes indeed")
    ).toDF("doc_id", "text")
  }

  private def increment() = {
    import spark.implicits._
    Seq(
      (6L, "prefix shared run lives here spanning exactly eight tokens yes indeed suffix"),
      (7L, "nothing in common with any corpus document whatsoever")
    ).toDF("doc_id", "text")
  }

  private def spans(idx: String) =
    TextOps.duplicatedSpansAgainst(increment(), idx, k = 3, minSpanTokens = 8, hashed = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def counts(idx: String) =
    TextOps.readShingleCounts(spark, idx, hashed = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("streamed index == batch index == union truth; replay never double-counts") {
    val cor = corpus()
    val flat = s"${tmpDir()}/flat"
    TextOps.writeShingleIndex(cor, flat, k = 3, nPb = 8, hashed = false)
    val truth = spans(flat)
    assert(truth.nonEmpty)

    // the spec-pinned identity: against-index == duplicatedSpans over the
    // union, restricted to increment docs
    val unionTruth = TextOps
      .duplicatedSpans(cor.unionByName(increment()), k = 3, minSpanTokens = 8, hashed = false)
      .filter(col("doc_id").isin(6L, 7L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(truth == unionTruth)

    // versioned: docs 1,4 as the bootstrapped base, stream {2} then {5}
    val ver = s"${tmpDir()}/ver"
    TextOps.writeShingleIndex(cor.filter(col("doc_id").isin(1L, 4L)), ver,
      k = 3, nPb = 8, hashed = false)
    StreamingOps.shingleBatch(cor.filter(col("doc_id") === 2L), 0L, ver, 3, 8, hashed = false)
    StreamingOps.shingleBatch(cor.filter(col("doc_id") === 5L), 1L, ver, 3, 8, hashed = false)
    assert(spans(ver) == truth)
    assert(counts(ver) == counts(flat))

    // checkpoint replay of the newest batch overwrites its own (shingle,
    // src) rows — the merged counts are UNCHANGED (a double-count would be
    // invisible to the dup flag here, so pin the counts themselves)
    StreamingOps.shingleBatch(cor.filter(col("doc_id") === 5L), 1L, ver, 3, 8, hashed = false)
    assert(counts(ver) == counts(flat))
    assert(spans(ver) == truth)
  }

  test("first landing records the sidecar; a drifted restart fails loudly") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.shingleBatch(corpus().filter(col("doc_id") === 1L), 0L, ver, 3, 8, hashed = false)
    assert(new java.io.File(s"$ver/_meta.json").exists())
    val e = intercept[IllegalArgumentException] {
      StreamingOps.shingleBatch(corpus().filter(col("doc_id") === 2L), 1L, ver, 4, 8, hashed = false)
    }
    assert(e.getMessage.contains("k: index=3 probe=4"))
  }

  test("compactShingleIndex folds committed deltas source-tagged, protects the newest") {
    val cor = corpus()
    val flat = s"${tmpDir()}/flat"
    TextOps.writeShingleIndex(cor, flat, k = 3, nPb = 8, hashed = false)
    val ver = s"${tmpDir()}/ver"
    TextOps.writeShingleIndex(cor.filter(col("doc_id") === 1L), ver, k = 3, nPb = 8, hashed = false)
    StreamingOps.shingleBatch(cor.filter(col("doc_id") === 2L), 0L, ver, 3, 8, hashed = false)
    StreamingOps.shingleBatch(cor.filter(col("doc_id") === 4L), 1L, ver, 3, 8, hashed = false)
    StreamingOps.shingleBatch(cor.filter(col("doc_id") === 5L), 2L, ver, 3, 8, hashed = false)
    val before = spans(ver)
    val beforeCounts = counts(ver)

    StreamingOps.compactShingleIndex(spark, ver)
    val dirs = new java.io.File(ver).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs == Seq("__batch=-1", "__batch=2"))
    assert(spans(ver) == before)
    assert(counts(ver) == beforeCounts)
    // rows stay PARTIALS: the folded base keeps its source tags (a summing
    // fold would have collapsed them — and double-counted on a crash-rerun)
    val srcs = spark.read
      .schema("shingle STRING, cnt LONG, src LONG, pb INT, __batch LONG")
      .parquet(ver).filter(col("__batch") === -1L)
      .select("src").distinct().collect().map(_.getLong(0)).toSet
    assert(srcs == Set(-1L, 0L, 1L))

    // the protected newest replays onto its own directory after the fold
    StreamingOps.shingleBatch(cor.filter(col("doc_id") === 5L), 2L, ver, 3, 8, hashed = false)
    assert(spans(ver) == before)
    assert(counts(ver) == beforeCounts)
  }

  test("shingleBatch refuses an index written by a different checkpoint lineage") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.shingleBatch(corpus().filter(col("doc_id") === 1L), 5L, ver, 3, 8, hashed = false)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.shingleBatch(corpus().filter(col("doc_id") === 2L), 0L, ver, 3, 8, hashed = false)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
