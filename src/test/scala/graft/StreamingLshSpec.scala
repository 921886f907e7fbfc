package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.streaming.StreamingOps

/** Streaming MinHash-LSH index maintenance: micro-batches of documents
  * land banded signatures in the versioned (band, bucket) layout, probes
  * against the streamed index equal probes against a batch-built one,
  * replay is idempotent, the parameter sidecar rejects a drifted restart,
  * and compactLshIndex folds committed deltas. */
class StreamingLshSpec extends SparkSpec {

  // two near-dup pairs across the corpus/increment split plus unrelated docs
  private def docs() = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog by the river bank"),
      (3L, "the quick brown fox leaps over the lazy dog by the river bank"),
      (4L, "completely different words about training data pipelines at scale"),
      (5L, "ein ganz anderer text in einer anderen sprache ohne bezug dazu"),
      (6L, "unrelated content about distributed query engines and storage")
    ).toDF("doc_id", "text")
  }

  private def probeSet(inc: org.apache.spark.sql.DataFrame,
      cor: org.apache.spark.sql.DataFrame, path: String) =
    DedupOps.minHashNearDupsIndexed(inc, cor, path, nBuckets = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed LSH index == batch-built index (indexed near-dup probe)") {
    val d = docs()
    val inc = d.filter(col("doc_id").isin(2L, 3L))
    val cor = d.filter(not(col("doc_id").isin(2L, 3L)))
    val flat = s"${tmpDir()}/flat"
    DedupOps.writeMinHashIndex(cor, flat, nBuckets = 8)
    val truth = probeSet(inc, cor, flat)
    assert(truth.nonEmpty)

    // versioned: bootstrap docs 1,4 as the base, stream 5 then 6
    val ver = s"${tmpDir()}/ver"
    StreamingOps.lshIndexBase(d.filter(col("doc_id").isin(1L, 4L)), ver, nBuckets = 8)
    StreamingOps.lshBatch(d.filter(col("doc_id") === 5L), 0L, ver,
      "doc_id", "text", 3, 16, 4, 8)
    StreamingOps.lshBatch(d.filter(col("doc_id") === 6L), 1L, ver,
      "doc_id", "text", 3, 16, 4, 8)
    assert(probeSet(inc, cor, ver) == truth)

    // checkpoint replay of the newest batch overwrites, never duplicates
    StreamingOps.lshBatch(d.filter(col("doc_id") === 6L), 1L, ver,
      "doc_id", "text", 3, 16, 4, 8)
    assert(probeSet(inc, cor, ver) == truth)
    assert(spark.read.parquet(ver).select("id").distinct().count() == 4)
  }

  test("first landing records the sidecar; a drifted restart fails loudly") {
    val d = docs()
    val ver = s"${tmpDir()}/ver"
    StreamingOps.lshBatch(d.filter(col("doc_id") === 1L), 0L, ver,
      "doc_id", "text", 3, 16, 4, 8)
    assert(new java.io.File(s"$ver/_meta.json").exists())
    val e = intercept[IllegalArgumentException] {
      StreamingOps.lshBatch(d.filter(col("doc_id") === 4L), 1L, ver,
        "doc_id", "text", 3, 16, 4, 64)
    }
    assert(e.getMessage.contains("nBuckets: index=8 probe=64"))
  }

  test("compactLshIndex folds committed deltas, protects the newest, keeps probes") {
    val d = docs()
    val inc = d.filter(col("doc_id").isin(2L, 3L))
    val cor = d.filter(not(col("doc_id").isin(2L, 3L)))
    val ver = s"${tmpDir()}/ver"
    StreamingOps.lshIndexBase(d.filter(col("doc_id") === 1L), ver, nBuckets = 8)
    StreamingOps.lshBatch(d.filter(col("doc_id") === 4L), 0L, ver, "doc_id", "text", 3, 16, 4, 8)
    StreamingOps.lshBatch(d.filter(col("doc_id") === 5L), 1L, ver, "doc_id", "text", 3, 16, 4, 8)
    StreamingOps.lshBatch(d.filter(col("doc_id") === 6L), 2L, ver, "doc_id", "text", 3, 16, 4, 8)
    val before = probeSet(inc, cor, ver)

    StreamingOps.compactLshIndex(spark, ver)
    val dirs = new java.io.File(ver).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs == Seq("__batch=-1", "__batch=2"))
    assert(probeSet(inc, cor, ver) == before)

    // the protected newest replays onto its own directory after the fold
    StreamingOps.lshBatch(d.filter(col("doc_id") === 6L), 2L, ver, "doc_id", "text", 3, 16, 4, 8)
    assert(probeSet(inc, cor, ver) == before)
    assert(spark.read.parquet(ver).select("id").distinct().count() == 4)
  }

  test("lshBatch refuses an index written by a different checkpoint lineage") {
    val d = docs()
    val ver = s"${tmpDir()}/ver"
    StreamingOps.lshBatch(d.filter(col("doc_id") === 1L), 5L, ver, "doc_id", "text", 3, 16, 4, 8)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.lshBatch(d.filter(col("doc_id") === 4L), 0L, ver, "doc_id", "text", 3, 16, 4, 8)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
