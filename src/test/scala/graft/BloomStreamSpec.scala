package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.streaming.StreamingOps

/** Streaming Bloom-sidecar maintenance: per-batch sketches OR-merge to
  * the byte-identical batch-built sketch, replay is idempotent, the
  * sizing sidecar rejects a drifted restart, and compactBloomIndex folds
  * committed deltas while protecting the newest. */
class BloomStreamSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (3L, "a completely different document about storage engines"),
      (4L, "ein weiterer text ohne gemeinsamkeiten mit den anderen"),
      (5L, "yet another unique document in the corpus split"),
      (6L, "nothing shared with any corpus document at all")
    ).toDF("doc_id", "text")
  }

  private val items = 1L << 10
  private val fp = 0.05

  test("streamed sketch levels OR-merge to the batch-built sketch, byte-identical") {
    val d = docs()
    val cor = d.filter(col("doc_id") <= 4L)
    val whole = DedupOps.corpusDigestBloom(cor, expectedItems = items, fpp = fp)

    val idx = s"${tmpDir()}/bloomidx"
    StreamingOps.bloomBatch(d.filter(col("doc_id").isin(1L, 2L)), 0L, idx, "text", items, fp)
    StreamingOps.bloomBatch(d.filter(col("doc_id") === 3L), 1L, idx, "text", items, fp)
    StreamingOps.bloomBatch(d.filter(col("doc_id") === 4L), 2L, idx, "text", items, fp)
    val merged = StreamingOps.readMergedBloom(spark, idx)
    assert(java.util.Arrays.equals(merged, whole),
      "streamed OR-merge != batch-built sketch bytes")

    // replay of the newest batch overwrites its own deterministic bytes
    StreamingOps.bloomBatch(d.filter(col("doc_id") === 4L), 2L, idx, "text", items, fp)
    assert(java.util.Arrays.equals(StreamingOps.readMergedBloom(spark, idx), whole))

    // and the merged sketch drives the exact incremental probe
    val inc = d.filter(col("doc_id") >= 5L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(rows(DedupOps.incrementalExactBloom(inc, cor, sketch = Some(merged))) ==
      rows(DedupOps.incrementalExact(inc, cor)))
  }

  test("a drifted restart fails loudly at the batch, not at a later probe") {
    val idx = s"${tmpDir()}/bloomidx"
    StreamingOps.bloomBatch(docs().filter(col("doc_id") === 1L), 0L, idx, "text", items, fp)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.bloomBatch(docs().filter(col("doc_id") === 3L), 1L, idx, "text",
        expectedItems = 1L << 12, fpp = fp)
    }
    assert(e.getMessage.contains("expectedItems: index=1024 batch=4096"))
  }

  test("compactBloomIndex folds committed deltas, protects the newest, keeps the merge") {
    val d = docs()
    val idx = s"${tmpDir()}/bloomidx"
    StreamingOps.bloomIndexBase(d.filter(col("doc_id") === 1L), idx,
      expectedItems = items, fpp = fp)
    StreamingOps.bloomBatch(d.filter(col("doc_id") === 2L), 0L, idx, "text", items, fp)
    StreamingOps.bloomBatch(d.filter(col("doc_id") === 3L), 1L, idx, "text", items, fp)
    StreamingOps.bloomBatch(d.filter(col("doc_id") === 4L), 2L, idx, "text", items, fp)
    val before = StreamingOps.readMergedBloom(spark, idx)

    StreamingOps.compactBloomIndex(spark, idx)
    val dirs = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs == Seq("__batch=-1", "__batch=2"))
    assert(java.util.Arrays.equals(StreamingOps.readMergedBloom(spark, idx), before))

    // rerunning the fold is a no-op on the merge (OR is idempotent)
    StreamingOps.compactBloomIndex(spark, idx)
    assert(java.util.Arrays.equals(StreamingOps.readMergedBloom(spark, idx), before))

    // crash window: base retired but staging not yet installed — readers
    // union the leftover, and a fold rerun restores the base
    val baseFile = new java.io.File(s"$idx/__batch=-1/bloom.bin")
    val retiredFile = new java.io.File(s"$idx/_retired.bin")
    assert(baseFile.renameTo(retiredFile))
    assert(java.util.Arrays.equals(StreamingOps.readMergedBloom(spark, idx), before))
    StreamingOps.compactBloomIndex(spark, idx)
    assert(baseFile.exists() && !retiredFile.exists())
    assert(java.util.Arrays.equals(StreamingOps.readMergedBloom(spark, idx), before))
  }

  test("bloomBatch refuses an index written by a different checkpoint lineage") {
    val idx = s"${tmpDir()}/bloomidx"
    StreamingOps.bloomBatch(docs().filter(col("doc_id") === 1L), 5L, idx, "text", items, fp)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.bloomBatch(docs().filter(col("doc_id") === 3L), 0L, idx, "text", items, fp)
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }
}
