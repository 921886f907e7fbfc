package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.StreamingOps

/** Multinomial Naive Bayes train-and-classify + its streamed model
  * maintenance (additive evidence — the counts ARE the model). Oracle
  * rows: g_nb_langid, q_stream_nb (shared truth). */
class NbSpec extends SparkSpec {
  import spark.implicits._

  // two clearly separable "languages": disjoint-ish vocabularies
  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(67)
    (0L until 100L).map { i =>
      val en = i % 2 == 0
      val words =
        if (en) Seq.fill(10)(Seq("the", "of", "cat", "dog")(rnd.nextInt(4)))
        else Seq.fill(10)(Seq("le", "la", "chat", "chien")(rnd.nextInt(4)))
      (i, words.mkString(" "), if (en) "en" else "fr")
    }.toDF("doc_id", "text", "lang")
  }

  test("NB separates disjoint vocabularies and is total on unseen tokens") {
    val lm = corpus.filter(col("doc_id") < 60)
    val test = corpus.filter(col("doc_id") >= 60)
    val preds = TextOps.nbTrainScore(test, lm)
      .join(corpus.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("pred") === col("lang")).as[Boolean].collect()
    assert(preds.forall(identity), "NB misclassified a separable doc")
    // wholly unseen tokens: smoothing floor keeps scores finite and the
    // argmax falls to the prior-favored class deterministically
    val weird = Seq((999L, "zzz qqq www")).toDF("doc_id", "text")
    val row = TextOps.nbTrainScore(weird, lm)
      .as[(Long, String, Double)].collect().head
    assert(!row._3.isNaN && !row._3.isInfinite)
  }

  test("streamed counts == batch model; replay + fold + lineage") {
    val p = s"${tmpDir()}/nb"
    StreamingOps.nbBatch(corpus.filter(col("doc_id") < 30), 0L, p, "lang", "text")
    StreamingOps.nbBatch(corpus.filter(col("doc_id") >= 30 && col("doc_id") < 60),
      1L, p, "lang", "text")
    val (ncw, cls) = StreamingOps.readNbCounts(spark, p)
    val test = corpus.filter(col("doc_id") >= 60)
    val viaStream = TextOps.nbScore(test, ncw, cls)
      .as[(Long, String, Double)].collect().toSeq.sorted
    val viaBatch = TextOps.nbTrainScore(test, corpus.filter(col("doc_id") < 60))
      .as[(Long, String, Double)].collect().toSeq.sorted
    assert(viaStream == viaBatch)
    // replay overwrites; compaction folds both roots and keeps the model
    StreamingOps.nbBatch(corpus.filter(col("doc_id") >= 30 && col("doc_id") < 60),
      1L, p, "lang", "text")
    StreamingOps.compactNbCounts(spark, p)
    def levels(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(levels(s"$p/_ncw") == Seq("__batch=-1", "__batch=1"))
    assert(levels(s"$p/_cls") == Seq("__batch=-1", "__batch=1"))
    val (ncw2, cls2) = StreamingOps.readNbCounts(spark, p)
    assert(TextOps.nbScore(test, ncw2, cls2)
      .as[(Long, String, Double)].collect().toSeq.sorted == viaBatch)
    // lineage refusal (foreign checkpoint below the committed frontier)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.nbBatch(corpus.filter(col("doc_id") < 5), 0L, p, "lang", "text")
    }
    assert(e.getMessage.contains("different checkpoint lineage"))
  }

  test("classEval: exact one-vs-rest counts, P/R/F1, macro-F1 on a hand fixture") {
    // 6 docs, 3 classes; class c never predicted (recall row must exist)
    val scored = Seq(
      (0L, "a", "a"), (1L, "a", "b"), (2L, "b", "b"),
      (3L, "b", "b"), (4L, "c", "a"), (5L, "c", "b"))
      .toDF("doc_id", "label", "pred")
    val rows = TextOps.classEval(scored)
      .select("class", "tp", "fp", "fn", "precision_", "recall_", "f1", "macro_f1")
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    // a: tp=1 fp=1 fn=1  P=0.5 R=0.5 F1=0.5
    // b: tp=2 fp=2 fn=0  P=0.5 R=1.0 F1=2/3 floored
    // c: tp=0 fp=0 fn=2  P=0 R=0 F1=0
    assert(rows.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq(("a", 1L, 1L, 1L), ("b", 2L, 2L, 0L), ("c", 0L, 0L, 2L)))
    val a = rows(0); val b = rows(1); val c = rows(2)
    assert(a._5 == 0.5 && a._6 == 0.5 && a._7 == 0.5)
    assert(b._5 == 0.5 && b._6 == 1.0 && b._7 == math.floor(2.0 / 3.0 * 1e6) / 1e6)
    assert(c._5 == 0.0 && c._6 == 0.0 && c._7 == 0.0)
    // macro = floored mean of the FLOORED per-class F1s, same on all rows
    val expMacro = math.floor((0.5 + b._7 + 0.0) / 3.0 * 1e6) / 1e6
    assert(rows.map(_._8).distinct == Seq(expMacro))
  }
}
