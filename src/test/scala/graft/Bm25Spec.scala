package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps

/** Lexical retrieval + hybrid fusion: BM25 against an independent Scala
  * reference (same quantization discipline), the top-k slice identity,
  * query-term edge cases, postings-index bit-equality with the full scan,
  * sidecar drift refusal, and RRF fold semantics. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val Vocab =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "rare1", "rare2")

  /** Deterministic random corpus: doc id → token list. */
  private def randomTexts(n: Int, seed: Int = 7): Map[Long, Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(20))(Vocab(rnd.nextInt(Vocab.size)))
    }.toMap
  }

  private def toDf(texts: Map[Long, Seq[String]]): DataFrame =
    texts.toSeq.sortBy(_._1).map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")

  /** Double → the DECIMAL(18,8) grid the engine casts through (Spark's
    * double→decimal goes via the shortest-repr BigDecimal, HALF_UP). */
  private def dec8(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP))

  /** Independent reference scorer mirroring [[RetrievalOps.bm25Scores]]'s
    * exactness contract. */
  private def refBm25(
      texts: Map[Long, Seq[String]],
      query: Seq[String],
      k1: Double = RetrievalOps.DefaultK1,
      b: Double = RetrievalOps.DefaultB): Map[Long, (Long, Double)] = {
    val terms = query.distinct
    val n = texts.size.toLong
    val a = texts.values.map(_.size.toLong).sum
    val df = terms.map(t => t -> texts.values.count(_.contains(t)).toLong).toMap
    texts.flatMap { case (id, toks) =>
      val tfs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0L) None else Some(t -> tf)
      }
      if (tfs.isEmpty) None
      else {
        val dl = toks.size.toLong
        val sum = tfs.map { case (t, tf) =>
          val idf = dec8(math.log(
            1.0 + (n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5))).toDouble
          val sat = (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / (a.toDouble / n.toDouble))))
          dec8(idf * sat)
        }.sum
        Some(id -> (tfs.size.toLong, math.floor(sum.toDouble * 10000) / 10000))
      }
    }
  }

  test("bm25Scores == independent reference on a random corpus") {
    val texts = randomTexts(40)
    val query = Seq("alpha", "rare1", "zeta")
    val got = RetrievalOps.bm25Scores(toDf(texts), query)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == refBm25(texts, query))
  }

  test("bm25TopK is the k-slice of the scores by (score desc, doc_id)") {
    val texts = randomTexts(30, seed = 11)
    val query = Seq("beta", "rare2")
    val all = refBm25(texts, query).toSeq
      .sortBy { case (id, (_, s)) => (-s, id) }
    val got = RetrievalOps.bm25TopK(toDf(texts), query, k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == all.take(5).map(_._1))
    assert(got.map(_._3) == all.take(5).map(_._2._2))
  }

  test("query terms absent from the corpus are ignored; all-absent query is empty") {
    val texts = randomTexts(10, seed = 3)
    val mixed = RetrievalOps.bm25Scores(toDf(texts), Seq("alpha", "nosuchtok"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(mixed == refBm25(texts, Seq("alpha")))
    assert(RetrievalOps.bm25Scores(toDf(texts), Seq("nosuchtok")).isEmpty)
  }

  test("repeated query terms score once (distinct-term semantics)") {
    val texts = randomTexts(10, seed = 5)
    val once = RetrievalOps.bm25Scores(toDf(texts), Seq("gamma"))
      .as[(Long, Long, Double)].collect().toSet
    val twice = RetrievalOps.bm25Scores(toDf(texts), Seq("gamma", "gamma"))
      .as[(Long, Long, Double)].collect().toSet
    assert(once == twice)
  }

  test("bm25TopKIndexed over a written postings index == the full-scan bm25TopK") {
    val texts = randomTexts(35, seed = 13)
    val query = Seq("alpha", "rare1", "delta")
    val path = tmpDir() + "/postings"
    RetrievalOps.writePostingsIndex(toDf(texts), path, nPt = 8)
    val scan = RetrievalOps.bm25TopK(toDf(texts), query, k = 7)
      .as[(Long, Long, Double)].collect().toSeq
    val idx = RetrievalOps.bm25TopKIndexed(spark, path, query, k = 7)
      .as[(Long, Long, Double)].collect().toSeq
    assert(idx == scan)
  }

  test("indexed probe refuses an index root without its _meta.json sidecar") {
    val bare = tmpDir()
    val e = intercept[IllegalArgumentException] {
      RetrievalOps.bm25TopKIndexed(spark, bare, Seq("alpha"))
    }
    assert(e.getMessage.contains("_meta.json"))
  }

  test("phraseMatches: anchors, overlap, repeated terms, edge phrases") {
    val df = Seq(
      (0L, "a b c a b"), // "a b" twice
      (1L, "x x x"), // "x x" twice — OVERLAPPING occurrences
      (2L, "a"), // shorter than the phrase
      (3L, "b a"), // reversed — no match
      (4L, "a b") // once, at position 0
    ).toDF("doc_id", "text")
    def hits(p: Seq[String]) = RetrievalOps.phraseMatches(df, p)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(hits(Seq("a", "b")) == Seq((0L, 2L, 0L), (4L, 1L, 0L)))
    assert(hits(Seq("x", "x")) == Seq((1L, 2L, 0L)))
    assert(hits(Seq("a", "b", "c")) == Seq((0L, 1L, 0L)))
    // single-term phrase degenerates to term occurrences
    assert(hits(Seq("a")) ==
      Seq((0L, 2L, 0L), (2L, 1L, 0L), (3L, 1L, 1L), (4L, 1L, 0L)))
    assert(hits(Seq("zzz", "a")).isEmpty)
  }

  test("phraseMatches matches a sliding-window reference on the random corpus") {
    val texts = randomTexts(40, seed = 19)
    val phrase = Seq("alpha", "beta")
    val got = RetrievalOps.phraseMatches(toDf(texts), phrase)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val ref = texts.toSeq.flatMap { case (id, ts) =>
      val anchors = ts.sliding(2).zipWithIndex
        .collect { case (w, i) if w == phrase => i.toLong }.toSeq
      if (anchors.isEmpty) None else Some((id, anchors.size.toLong, anchors.min))
    }.sorted
    assert(got == ref && got.nonEmpty)
  }

  test("bm25PhraseTopK == the full ranking semi-filtered to phrase docs") {
    val texts = randomTexts(40, seed = 19)
    val query = Seq("gamma", "rare1")
    val phrase = Seq("alpha", "beta")
    val matching = texts.filter(_._2.sliding(2).contains(phrase)).keySet
    val expect = RetrievalOps.bm25Scores(toDf(texts), query)
      .as[(Long, Long, Double)].collect().toSeq
      .filter(r => matching.contains(r._1))
      .sortBy(r => (-r._3, r._1)).take(5)
    val got = RetrievalOps.bm25PhraseTopK(toDf(texts), query, phrase, k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("phraseMatchesIndexed over the positional index == the full scan") {
    val texts = randomTexts(40, seed = 19)
    val path = tmpDir() + "/posidx"
    RetrievalOps.writePostingsIndex(toDf(texts), path, nPt = 8)
    for (p <- Seq(Seq("alpha", "beta"), Seq("alpha", "alpha"), Seq("gamma"))) {
      val scan = RetrievalOps.phraseMatches(toDf(texts), p)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val idx = RetrievalOps.phraseMatchesIndexed(spark, path, p)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(idx == scan, s"phrase $p")
    }
    // and the SAME index still serves BM25 (positions pruned away)
    val q = Seq("alpha", "rare1")
    assert(RetrievalOps.bm25TopKIndexed(spark, path, q, k = 5)
      .as[(Long, Long, Double)].collect().toSeq ==
      RetrievalOps.bm25TopK(toDf(texts), q, k = 5)
        .as[(Long, Long, Double)].collect().toSeq)
  }

  test("bm25PhraseTopKIndexed == the full-scan phrase-filtered ranking") {
    val texts = randomTexts(40, seed = 19)
    val path = tmpDir() + "/servelex"
    RetrievalOps.writePostingsIndex(toDf(texts), path, nPt = 8)
    val query = Seq("gamma", "rare1")
    val phrase = Seq("alpha", "beta")
    val scan = RetrievalOps.bm25PhraseTopK(toDf(texts), query, phrase, k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    val idx = RetrievalOps.bm25PhraseTopKIndexed(spark, path, query, phrase, k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(idx == scan && idx.nonEmpty)
  }

  test("bm25FacetedTopK: per-facet cut of the corpus-wide ranking") {
    val texts = randomTexts(40, seed = 19)
    val query = Seq("gamma", "rare1")
    // facet = doc_id mod 3, attached to the corpus frame
    val df = toDf(texts).withColumn("source", concat(lit("s"), col("doc_id") % 3))
    val got = RetrievalOps.bm25FacetedTopK(df, query, perSource = 2)
      .as[(String, Int, Long, Long, Double)].collect().toSeq.sorted
    val scores = RetrievalOps.bm25Scores(toDf(texts), query)
      .as[(Long, Long, Double)].collect().toSeq
    val ref = scores.groupBy(r => s"s${r._1 % 3}").toSeq.flatMap { case (src, rs) =>
      rs.sortBy(r => (-r._3, r._1)).take(2).zipWithIndex
        .map { case ((id, nt, s), i) => (src, i + 1, id, nt, s) }
    }.sorted
    assert(got == ref && got.nonEmpty)
    // scoring is corpus-wide: scores equal the unfaceted ranking's
    assert(got.map(r => (r._3, r._5)).toMap ==
      scores.filter(r => got.exists(_._3 == r._1)).map(r => (r._1, r._3)).toMap)
  }

  test("snippets: earliest-anchor windows, clipping, absent docs excluded") {
    val df = Seq(
      (0L, "a b gamma c d e f"), // interior anchor
      (1L, "gamma x y z"), // anchor at 0 — left-clipped
      (2L, "p q r s t gamma"), // anchor at end — right-clipped
      (3L, "no match here"), // excluded
      (4L, "rare1 u gamma v") // two terms — earliest wins
    ).toDF("doc_id", "text")
    val got = RetrievalOps.snippets(df, Seq("gamma", "rare1"), window = 2)
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(got == Seq(
      (0L, 2L, "a b gamma c d"),
      (1L, 0L, "gamma x y"),
      (2L, 5L, "s t gamma"),
      (4L, 0L, "rare1 u gamma")))
  }

  test("rrfFuse: hand-computed fold, arm counts, and (rrf desc, id) order") {
    val armA = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val armB = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val got = RetrievalOps.rrfFuse(Seq(armA, armB), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    def r(ranks: Seq[Int]): Double = {
      val s = ranks.map(rk => dec8(1.0 / (60.0 + rk.toDouble))).sum
      math.floor(s.toDouble * 1e6) / 1e6
    }
    val expected = Seq(
      2L -> (2L, r(Seq(2, 1))), // both arms
      1L -> (1L, r(Seq(1))),
      4L -> (1L, r(Seq(2))),
      3L -> (1L, r(Seq(3))))
      .sortBy { case (id, (_, s)) => (-s, id) }
      .map { case (id, (na, s)) => (id, na, s) }
    assert(got == expected)
  }

  test("rrfFuse: k cuts after the fold, not per arm") {
    val armA = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val armB = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    // id 2 appears in both arms -> highest fused score even though it is
    // rank-2 in arm A; k=1 must pick it
    val got = RetrievalOps.rrfFuse(Seq(armA, armB), k = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(2L) && got.head._2 == 2L)
  }

  test("hybridTopK fuses the lexical and vector arms over shared ids") {
    val texts = randomTexts(20, seed = 17)
    val rnd = new scala.util.Random(23)
    val embs = (0L until 20L).map(i => (i, Seq.fill(8)(rnd.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val qv = (0 until 8).map(_ => rnd.nextDouble())
    val got = RetrievalOps.hybridTopK(
        toDf(texts), embs, Seq("alpha", "rare1"), qv, k = 5, poolK = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 5)
    assert(got.map(_._3) == got.map(_._3).sorted.reverse) // rrf desc
    assert(got.forall(r => r._2 >= 1L && r._2 <= 2L))
    // the vector arm alone contributes ids even when the lexical arm
    // misses them: at least one pick must be vector-only or lexical-only
    // on this corpus, and any two-arm pick must beat a same-rank singleton
    assert(got.map(_._1).distinct.size == 5)
  }
}
