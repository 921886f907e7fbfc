package graft

import org.apache.spark.sql.DataFrame
import graft.operators.RetrievalOps
import graft.streaming.StreamingOps

/** Streaming postings-index maintenance — the [[Sq8StreamSpec]] contract
  * for the lexical-retrieval layout: micro-batches land `(doc_id, dl)`
  * sidecar rows FIRST then pt-partitioned postings deltas, probes read
  * the roots unchanged with in-DAG corpus constants, replay is
  * idempotent, the nPt sidecar refuses a drifted restart, and
  * compactPostingsIndex folds BOTH roots without touching the protected
  * newest delta. The single-stream oracle row is q_stream_postings. */
class PostingsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Vocab =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "rare1", "rare2")

  private def texts(ids: Range): Map[Long, Seq[String]] = {
    val rnd = new scala.util.Random(29)
    val all = (0L until 60L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(15))(Vocab(rnd.nextInt(Vocab.size)))
    }.toMap
    ids.map(i => i.toLong -> all(i.toLong)).toMap
  }

  private def toDf(ids: Range): DataFrame =
    texts(ids).toSeq.sortBy(_._1).map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")

  private val Query = Seq("alpha", "rare1", "delta")

  private def topAll(path: String): Seq[(Long, Long, Double)] =
    RetrievalOps.bm25TopKIndexed(spark, path, Query, k = 8)
      .as[(Long, Long, Double)].collect().toSeq

  test("streamed postings == batch-built index == full scan; replay overwrites") {
    val flat = s"${tmpDir()}/flat"
    RetrievalOps.writePostingsIndex(toDf(0 until 60), flat, nPt = 8)
    val truth = topAll(flat)
    // and the full-scan scorer agrees (idf/avgdl over the WHOLE streamed
    // corpus, not any single level's snapshot)
    val scan = RetrievalOps.bm25TopK(toDf(0 until 60), Query, k = 8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(truth == scan)

    val ver = s"${tmpDir()}/ver"
    RetrievalOps.writePostingsIndex(toDf(0 until 25), ver, nPt = 8)
    StreamingOps.postingsBatch(toDf(25 until 45), 0L, ver, 8, "doc_id", "text")
    StreamingOps.postingsBatch(toDf(45 until 60), 1L, ver, 8, "doc_id", "text")
    assert(topAll(ver) == truth)

    // checkpoint replay of the newest batch overwrites, never duplicates
    StreamingOps.postingsBatch(toDf(45 until 60), 1L, ver, 8, "doc_id", "text")
    assert(topAll(ver) == truth)

    // the streamed POSITIONAL layout serves phrase probes identically to
    // the full scan (same index, positions landed per batch)
    val phrase = Seq("alpha", "rare1")
    val phraseScan = RetrievalOps.phraseMatches(toDf(0 until 60), phrase)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val phraseIdx = RetrievalOps.phraseMatchesIndexed(spark, ver, phrase)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(phraseIdx == phraseScan)
  }

  test("nPt sidecar refuses a drifted restart (probe AND maintenance)") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.postingsBatch(toDf(0 until 10), 0L, ver, 8, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.postingsBatch(toDf(10 until 20), 1L, ver, 4, "doc_id", "text")
    }
    assert(e.getMessage.contains("routing mismatch"))
  }

  test("compactPostingsIndex folds both roots, protects the newest, keeps results") {
    val ver = s"${tmpDir()}/ver"
    RetrievalOps.writePostingsIndex(toDf(0 until 20), ver, nPt = 8)
    StreamingOps.postingsBatch(toDf(20 until 35), 0L, ver, 8, "doc_id", "text")
    StreamingOps.postingsBatch(toDf(35 until 50), 1L, ver, 8, "doc_id", "text")
    StreamingOps.postingsBatch(toDf(50 until 60), 2L, ver, 8, "doc_id", "text")
    val before = topAll(ver)

    StreamingOps.compactPostingsIndex(spark, ver)
    def levels(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(levels(ver) == Seq("__batch=-1", "__batch=2"))
    assert(levels(s"$ver/_docs") == Seq("__batch=-1", "__batch=2"))
    assert(topAll(ver) == before)
    // the fold is lossless row-wise too: one sidecar row per doc
    assert(spark.read.schema("doc_id LONG, dl LONG, __batch LONG")
      .parquet(s"$ver/_docs").select("doc_id").distinct().count() == 60)

    // the protected newest replays onto its own directory after the fold
    StreamingOps.postingsBatch(toDf(50 until 60), 2L, ver, 8, "doc_id", "text")
    assert(topAll(ver) == before)
  }

  test("postingsBatch refuses an index written by a different checkpoint lineage") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.postingsBatch(toDf(0 until 5), 5L, ver, 8, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.postingsBatch(toDf(5 until 10), 0L, ver, 8, "doc_id", "text")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }

  test("foreign checkpoint after a partial crash is refused on the _docs root") {
    val ver = s"${tmpDir()}/ver"
    StreamingOps.postingsBatch(toDf(0 until 20), 0L, ver, 8, "doc_id", "text")
    // crash between batch 1's two writes: its _docs delta landed, its
    // postings delta did not — the postings root alone now looks clean
    RetrievalOps.writeDocsDelta(toDf(20 until 40), s"$ver/_docs/__batch=1",
      "doc_id", "text")
    // a foreign checkpoint restarting below the orphaned sidecar delta
    // must refuse: before the dual-root guard the postings root passed
    // and the restart would march forward to silently overwrite __batch=1
    val e = intercept[IllegalArgumentException] {
      StreamingOps.postingsBatch(toDf(20 until 40), 0L, ver, 8, "doc_id", "text")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
    // the ORIGINAL checkpoint's replay of the crashed batch still heals
    StreamingOps.postingsBatch(toDf(20 until 40), 1L, ver, 8, "doc_id", "text")
    val scan = RetrievalOps.bm25TopK(toDf(0 until 40), Query, k = 8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(topAll(ver) == scan)
  }

  test("_docs-first crash window: a half-landed doc is in the constants, matches nothing") {
    val ver = s"${tmpDir()}/ver"
    RetrievalOps.writePostingsIndex(toDf(0 until 30), ver, nPt = 8)
    val whole = topAll(ver)
    // simulate a crash between postingsBatch's two writes: the batch's
    // _docs delta landed, its postings did not
    RetrievalOps.writeDocsDelta(toDf(30 until 60), s"$ver/_docs/__batch=0",
      "doc_id", "text")
    val window = topAll(ver)
    // the half-landed docs shift N/avgdl (constants see them) but can
    // never match — no phantom df contribution, no dropped join rows
    assert(window.map(_._1).toSet.subsetOf(whole.map(_._1).toSet ++ (0L until 30L)))
    assert(window.map(_._1).forall(_ < 30L))
    // the replayed batch heals the window into the converged corpus
    StreamingOps.postingsBatch(toDf(30 until 60), 0L, ver, 8, "doc_id", "text")
    val scan = RetrievalOps.bm25TopK(toDf(0 until 60), Query, k = 8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(topAll(ver) == scan)
  }
}
