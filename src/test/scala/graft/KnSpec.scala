package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.StreamingOps

/** Interpolated Kneser–Ney bigram scoring + its streamed count
  * maintenance: the KN normalization invariant (Σ_b P(b|a) = 1 for every
  * seen context), totality on cross-corpus unknowns, and streamed counts
  * == batch counts (fold, replay, lineage). Oracle rows: g_kn_score,
  * q_stream_kn (shared truth). */
class KnSpec extends SparkSpec {
  import spark.implicits._

  private val LmVocab = Vector("a", "b", "c", "d", "e")

  private def lmDocs: DataFrame = {
    val rnd = new scala.util.Random(53)
    val base = (0L until 30L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(12))(LmVocab(rnd.nextInt(LmVocab.size))).mkString(" "))
    }
    // singleton tokens (below minCount = 2) put <unk> INTO the LM's pair
    // types on both sides, so the mapped vocabulary is fully observed and
    // the Pcont max(·,1) totality floor is a no-op here — the
    // normalization test below is exact only then (the floor deliberately
    // adds mass for never-seen-as-successor tokens; that case is covered
    // by the totality test instead)
    (base :+ (30L, "rare1 a b rare2") :+ (31L, "c rare3 d"))
      .toDF("doc_id", "text")
  }

  test("KN invariant: probabilities over the vocabulary sum to 1 per seen context") {
    // one probe doc per (context, successor) pair: its single bigram's
    // avg_logprob IS ln P(b|a) (4-digit floored). The mapped vocabulary
    // is LmVocab ++ <unk>; an <unk> probe token maps there by being
    // out-of-vocab. Σ_b exp(ln P(b|a)) must be 1 up to the floor error.
    val vocabPlus = LmVocab :+ "zzz-oov" // maps to <unk>
    val probes = (for ((a, i) <- vocabPlus.zipWithIndex;
                       (b, j) <- vocabPlus.zipWithIndex)
      yield ((i * vocabPlus.size + j).toLong, s"$a $b")).toDF("doc_id", "text")
    val scored = TextOps.knScoreAgainst(probes, lmDocs, minCount = 2L)
      .select(col("doc_id"), col("avg_logprob"))
      .as[(Long, Double)].collect().toMap
    assert(scored.size == vocabPlus.size * vocabPlus.size)
    for ((a, i) <- vocabPlus.zipWithIndex) {
      val total = vocabPlus.indices
        .map(j => math.exp(scored((i * vocabPlus.size + j).toLong))).sum
      // 4-digit floor on each of |V|+1 logs -> generous but tight-enough band
      assert(math.abs(total - 1.0) < 1e-3,
        s"sum_b P(b|'$a') = $total, expected 1")
    }
  }

  test("cross-corpus totality: unseen tokens, pairs, and contexts score finite") {
    val weird = Seq(
      (0L, "q r s t"),            // every token OOV -> <unk> chains
      (1L, "a q a"),              // unseen pairs through a known token
      (2L, "e e e e")             // possibly unseen context repetitions
    ).toDF("doc_id", "text")
    val rows = TextOps.knScoreAgainst(weird, lmDocs, minCount = 2L)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(0L, 1L, 2L))
    assert(rows.forall { case (_, n, lp) => n > 0 && lp < 0 &&
      !lp.isNaN && !lp.isInfinite })
  }

  test("streamed counts == batch counts; score via stream == knScoreAgainst") {
    val p = s"${tmpDir()}/kn"
    val half1 = lmDocs.filter(col("doc_id") < 15)
    val half2 = lmDocs.filter(col("doc_id") >= 15)
    StreamingOps.knBatch(half1, 0L, p, "doc_id", "text")
    StreamingOps.knBatch(half2, 1L, p, "doc_id", "text")
    val (uni, pairs) = StreamingOps.readKnCounts(spark, p)
    val batchUni = TextOps.knUnigramCounts(lmDocs)
      .as[(String, Long)].collect().toSeq.sorted
    assert(uni.as[(String, Long)].collect().toSeq.sorted == batchUni)
    val batchPairs = TextOps.knPairCounts(lmDocs)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(pairs.as[(String, String, Long)].collect().toSeq.sorted == batchPairs)

    val probe = Seq((100L, "a b q c"), (101L, "d e a")).toDF("doc_id", "text")
    val viaStream = TextOps.knScore(probe, uni, pairs, 2L)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val viaBatch = TextOps.knScoreAgainst(probe, lmDocs, 2L)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(viaStream == viaBatch)

    // replay of the newest batch overwrites, never double-counts
    StreamingOps.knBatch(half2, 1L, p, "doc_id", "text")
    assert(StreamingOps.readKnCounts(spark, p)._2
      .as[(String, String, Long)].collect().toSeq.sorted == batchPairs)

    // compaction folds both roots, keeps the merge, protects the newest
    StreamingOps.compactKnCounts(spark, p)
    def levels(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(levels(s"$p/_pairs") == Seq("__batch=-1", "__batch=1"))
    assert(levels(s"$p/_unigrams") == Seq("__batch=-1", "__batch=1"))
    assert(StreamingOps.readKnCounts(spark, p)._2
      .as[(String, String, Long)].collect().toSeq.sorted == batchPairs)
  }

  test("trigram KN invariant: probabilities sum to 1 per context, seen or backed off") {
    // one probe doc per (u, v, w): its single trigram's avg_logprob IS
    // ln P3(w|u,v). Whatever branch the (u, v) context takes — seen
    // trigram context, bigram-continuation backoff, or the unigram
    // floor — each level normalizes, so Σ_w P3(w|u,v) = 1 whenever the
    // mapped vocabulary is fully observed at that level (the lmDocs
    // rare-token docs put <unk> into the trigram types).
    val vocabPlus = LmVocab :+ "zzz-oov"
    val contexts = Seq(("a", "b"), ("e", "zzz-oov"), ("zzz-oov", "c"))
    val probes = (for (((u, v), ci) <- contexts.zipWithIndex;
                       (w, j) <- vocabPlus.zipWithIndex)
      yield ((ci * 100 + j).toLong, s"$u $v $w")).toDF("doc_id", "text")
    val scored = TextOps.kn3ScoreAgainst(probes, lmDocs, minCount = 2L)
      .select(col("doc_id"), col("avg_logprob"))
      .as[(Long, Double)].collect().toMap
    for (((u, v), ci) <- contexts.zipWithIndex) {
      val total = vocabPlus.indices
        .map(j => math.exp(scored((ci * 100 + j).toLong))).sum
      assert(math.abs(total - 1.0) < 1e-3,
        s"sum_w P3(w|'$u','$v') = $total, expected 1")
    }
  }

  test("trigram streamed counts == batch; fold + replay + lineage") {
    val p = s"${tmpDir()}/kn3"
    StreamingOps.kn3Batch(lmDocs.filter(col("doc_id") < 15), 0L, p, "doc_id", "text")
    StreamingOps.kn3Batch(lmDocs.filter(col("doc_id") >= 15), 1L, p, "doc_id", "text")
    val (uni, tri) = StreamingOps.readKn3Counts(spark, p)
    val batchTri = TextOps.knTrigramCounts(lmDocs)
      .as[(String, String, String, Long)].collect().toSeq.sorted
    assert(tri.as[(String, String, String, Long)].collect().toSeq.sorted == batchTri)

    val probe = Seq((100L, "a b q c d"), (101L, "d e a b")).toDF("doc_id", "text")
    val viaStream = TextOps.kn3Score(probe, uni, tri, 2L)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val viaBatch = TextOps.kn3ScoreAgainst(probe, lmDocs, 2L)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(viaStream == viaBatch)

    // replay overwrites; compaction folds both roots and keeps the merge
    StreamingOps.kn3Batch(lmDocs.filter(col("doc_id") >= 15), 1L, p, "doc_id", "text")
    StreamingOps.compactKn3Counts(spark, p)
    def levels(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(levels(s"$p/_trigrams") == Seq("__batch=-1", "__batch=1"))
    assert(StreamingOps.readKn3Counts(spark, p)._2
      .as[(String, String, String, Long)].collect().toSeq.sorted == batchTri)

    val e = intercept[IllegalArgumentException] {
      StreamingOps.kn3Batch(lmDocs.filter(col("doc_id") < 5), 0L, p, "doc_id", "text")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }

  test("lineage refusal on both roots after a partial crash") {
    val p = s"${tmpDir()}/kn"
    StreamingOps.knBatch(lmDocs.filter(col("doc_id") < 10), 0L, p, "doc_id", "text")
    // crash between batch 1's two writes: _unigrams landed, _pairs did not
    TextOps.knUnigramCounts(lmDocs.filter(col("doc_id") >= 10))
      .withColumn("src", lit(1L))
      .write.parquet(s"$p/_unigrams/__batch=1")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.knBatch(lmDocs.filter(col("doc_id") >= 10), 0L, p, "doc_id", "text")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
    // the original checkpoint's replay of the crashed batch heals
    StreamingOps.knBatch(lmDocs.filter(col("doc_id") >= 10), 1L, p, "doc_id", "text")
    val batchPairs = TextOps.knPairCounts(lmDocs)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(StreamingOps.readKnCounts(spark, p)._2
      .as[(String, String, Long)].collect().toSeq.sorted == batchPairs)
  }
}
