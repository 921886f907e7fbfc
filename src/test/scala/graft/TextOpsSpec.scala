package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Unit coverage for the text-pipeline operators added in round 6
  * (redaction, chunking, distinctive terms, co-occurrence lift, unigram
  * LM score) — especially the sequential-redaction counting semantics and
  * the overflow-safe lift arithmetic. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("qualityLogit: hand-computed logit and threshold decision") {
    // "the a b" : n_tok=3, text len=7, mean_tok_len=(7-2)/3, punct=0/7,
    // stopword hits = 2 (the, a)
    val out = TextOps.qualityLogit(docs("the a b"),
        wNTokens = 0.01, wMeanTokLen = 0.2, wPunct = -8.0, wStopword = 0.15,
        bias = -1.0, threshold = 0.0).head()
    val expected = math.floor((-1.0 + 0.01 * 3 + 0.2 * (5.0 / 3) + -8.0 * 0.0 + 0.15 * 2) * 10000) / 10000
    assert(out.getDouble(1) == expected)
    assert(out.getBoolean(2) == (expected >= 0.0))
  }

  test("qualityLogit: punctuation-heavy text is penalized below threshold") {
    val out = TextOps.qualityLogit(docs("!!! ??? ..."),
        wNTokens = 0.01, wMeanTokLen = 0.2, wPunct = -8.0, wStopword = 0.15,
        bias = -1.0, threshold = 0.0).head()
    assert(!out.getBoolean(2)) // punct ratio ~0.8 * -8 dominates
  }

  test("redact: counts match the spans actually masked under sequential replace") {
    // pattern 1 consumes the digits; pattern 2 must NOT count the original
    // "42" (it no longer exists in the text pattern 2 sees)
    val out = TextOps.redact(
        docs("customer 42 pays"),
        Seq("customer 42" -> "<X>", "[0-9]+" -> "<NUM>"))
      .head()
    assert(out.getInt(1) == 1)
    assert(out.getString(2) == "<X> pays")
  }

  test("redact: a mask introducing later-pattern matches is counted on the redacted text") {
    // sequential semantics: pattern 2 runs on "<C1> pays", so the mask's
    // own digit gets masked AND counted — count == spans masked, always
    val out = TextOps.redact(
        docs("customer pays"),
        Seq("customer" -> "<C1>", "[0-9]+" -> "#"))
      .head()
    assert(out.getInt(1) == 2)
    assert(out.getString(2) == "<C#> pays")
  }

  test("redact: empty pattern list is legal (0 redactions, text unchanged)") {
    val out = TextOps.redact(docs("anything 7 goes"), Seq.empty).head()
    assert(out.getInt(1) == 0)
    assert(out.getString(2) == "anything 7 goes")
  }

  test("redact: default patterns mask all occurrences") {
    val out = TextOps.redact(docs("customer key customer"), TextOps.RedactPatterns).head()
    assert(out.getInt(1) == 3)
    assert(out.getString(2) == "<NAME> <KEY> <NAME>")
  }

  test("chunkTokens: overlapping windows, short tail window") {
    val got = TextOps.chunkTokens(docs("a b c d e"), chunkSize = 3, stride = 2)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(got == Seq((0, 3, "a b c"), (1, 3, "c d e"), (2, 1, "e")))
  }

  test("chunkTokens: doc shorter than one chunk yields a single short window") {
    val got = TextOps.chunkTokens(docs("a b"), chunkSize = 32, stride = 24).collect()
    assert(got.length == 1)
    assert(got.head.getInt(1) == 0 && got.head.getInt(2) == 2 && got.head.getString(3) == "a b")
  }

  test("distinctiveTerms: ranks by (df asc, tf desc, term asc)") {
    // "rare" appears in 1 doc (df=1) -> outranks "both" (df=2) even though
    // tf("both") is larger; ties inside a df level break by tf desc
    val got = TextOps.distinctiveTerms(
        docs("both both both rare rare", "both other"), perDoc = 2)
      .filter(col("doc_id") === 0)
      .orderBy("rank")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq
    assert(got == Seq(("rare", 2L, 1L, 1), ("both", 3L, 2L, 2)))
  }

  test("cooccurrenceLift: exact basis points on a hand corpus") {
    // pair (x,y): c_xy=2, c_x=3, c_y=2, n=3 -> 2*3*10000/(3*2) = 10000 bp
    val got = TextOps.cooccurrenceLift(docs("x y", "x y z", "x"), topK = 10, minPairDocs = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(5)))
      .toSeq
    assert(got == Seq(("x", "y", 10000L)))
  }

  test("liftBp arithmetic survives corpus-scale counts (Long product would overflow)") {
    // c_xy = n = 4e9: the Long product c_xy*n*10000 = 1.6e23 overflows
    // Int64 (~9.2e18); the DECIMAL(38,0) path must stay exact
    val big = 4000000000L
    val row = Seq((big, big, big, big)).toDF("c_xy", "__n", "c_x", "c_y")
      .select(TextOps.liftBpExpr.as("lift_bp"))
      .head()
    val expected =
      (BigInt(big) * BigInt(big) * 10000 / (BigInt(big) * BigInt(big))).toLong
    assert(row.getLong(0) == expected) // == 10000
  }

  test("duplicatedPassages: shared shingles counted once per doc, hashed mode agrees") {
    // docs 0 and 1 share the shingle "a b c" (doc 1 contains it twice —
    // distinct-per-doc counts it ONCE); doc 2 shares nothing
    val d = docs("a b c d", "x a b c a b c", "p q r s")
    def rows(hashed: Boolean) = TextOps.duplicatedPassages(d, k = 3, hashed = hashed)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // doc 0: shingles {a b c, b c d} -> 1 dup of 2
    // doc 1: {x a b, a b c, b c a, c a b} -> 1 dup of 4
    // doc 2: {p q r, q r s} -> 0 dups
    val expected = Seq(
      (0L, 2L, 1L, 0.5),
      (1L, 4L, 1L, 0.25),
      (2L, 2L, 0L, 0.0))
    assert(rows(hashed = false) == expected)
    assert(rows(hashed = true) == expected)
  }

  test("duplicatedPassages: short docs contribute whole text as one shingle") {
    // "a b" (< k tokens) = one whole-text shingle; an identical short doc
    // makes it duplicated
    val got = TextOps.duplicatedPassages(docs("a b", "a b", "c"), k = 3, hashed = false)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((0L, 1L, 1L), (1L, 1L, 1L), (2L, 1L, 0L)))
  }

  test("duplicatedSpans: islands merge, within-doc repeats count, min length cuts") {
    // docs 0/1 share "a b c d e" verbatim -> shingles at idx 0..2 of each
    // are duplicated, merging into ONE span [0, 4] (5 tokens); doc 2's
    // lone duplicated shingle run is 3 tokens and is cut by min=5
    val d = docs(
      "a b c d e x y z w v",
      "q a b c d e r s t u",
      "m n a b c o p")
    val got = TextOps.duplicatedSpans(d, k = 3, minSpanTokens = 5, hashed = false)
      .orderBy("doc_id", "start_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 0L, 4L, 5L), (1L, 1L, 5L, 5L)))
    // within-doc repetition alone is a duplicate (substring semantics):
    // "a b c" twice -> spans at both sites, and "z z z z" repeats its own
    // "z z z" shingle at two offsets -> the z-run is a span too
    val solo = TextOps.duplicatedSpans(docs("a b c z z z z a b c"),
        k = 3, minSpanTokens = 3, hashed = false)
      .orderBy("start_tok")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(solo == Seq((0L, 2L), (3L, 6L), (7L, 9L)))
    // hashed mode returns identical spans
    val hashedGot = TextOps.duplicatedSpans(d, k = 3, minSpanTokens = 5, hashed = true)
      .orderBy("doc_id", "start_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(hashedGot == got)
  }

  test("clipDuplicatedSpans: covered tokens removed, no-span and fully-covered docs exact") {
    // identical docs 0/1 are fully covered -> ''; doc 2 untouched (keeps
    // its double space through the split/join round trip)
    val d = docs("a b c d e f g h", "a b c d e f g h", "p q  r")
    val got = TextOps.clipDuplicatedSpans(d, k = 3, minSpanTokens = 8, hashed = false)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((0L, ""), (1L, ""), (2L, "p q  r")))
    // partial coverage: shared prefix "a b c d e" clipped, tails survive
    val part = TextOps.clipDuplicatedSpans(
        docs("a b c d e x y z", "a b c d e u v w"),
        k = 3, minSpanTokens = 5, hashed = false)
      .orderBy("doc_id")
      .collect().map(r => r.getString(1)).toSeq
    assert(part == Seq("x y z", "u v w"))
  }

  test("tokenHeavyHitters: exact counts in the tracked regime, ties break on token") {
    // counts: a=4, b=3, c=3, d=1 -> top-3 is a, then b before c (tie on 3)
    val got = TextOps.tokenHeavyHitters(docs("a a b c", "a b c", "a b c d"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 4L), ("b", 3L), ("c", 3L)))
  }

  test("unigramLogProb: uniform corpus scores floor(ln(1/2)) at 4 digits") {
    // every token has corpus frequency 2 of 4 total -> lp = ln(0.5),
    // quantized to DECIMAL(18,8) then averaged then floored at 1e-4
    val got = TextOps.unigramLogProb(docs("x y", "x y"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
      .toSeq
    val q = BigDecimal(math.log(0.5)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val expected = math.floor(q.toDouble * 10000) / 10000
    assert(got == Seq((2L, expected), (2L, expected)))
  }

  // ---- BPE ------------------------------------------------------------

  /** Reference single-node BPE: greedy left-to-right merge pass. */
  private def refApplyMerge(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    s.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
      else out += x
    }
    out.toSeq
  }

  private def refBpe(
      wordFreq: Map[String, Long], nMerges: Int): (Seq[(String, String)], Map[String, Seq[String]]) = {
    var syms: Map[String, Seq[String]] = wordFreq.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    (0 until nMerges).foreach { _ =>
      if (!done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, f) <- wordFreq; p <- syms(w).sliding(2) if p.size == 2)
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        if (counts.isEmpty) done = true
        else {
          val top = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          merges += top
          syms = syms.map { case (w, s) => w -> refApplyMerge(s, top._1, top._2) }
        }
      }
    }
    (merges.toSeq, syms)
  }

  test("bpeApplyMerge folds greedily left-to-right (runs, chains, multi-char)") {
    val words = Seq(("aaa", 1L), ("abab", 1L), ("xaay", 1L))
      .toDF("word", "freq")
      .withColumn("syms", split(col("word"), ""))
    val got = TextOps.bpeApplyMerge(words, "a", "a")
      .collect().map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms")).toList).toMap
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("abab") == Seq("a", "b", "a", "b"))
    assert(got("xaay") == Seq("x", "aa", "y"))
    val ab = TextOps.bpeApplyMerge(words, "a", "b")
      .collect().map(r => r.getAs[String]("word") -> r.getSeq[String](r.fieldIndex("syms")).toList).toMap
    assert(ab("abab") == Seq("ab", "ab"))
  }

  test("learnBpe matches the single-node reference, merges in order, ties lexicographic") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "low new lower newer"),
    ).toDF("doc_id", "text")
    val wordFreq = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refMerges, refSyms) = refBpe(wordFreq, 6)
    val got = TextOps.learnBpe(docs, 6)
    assert(got == refMerges, s"merges diverged: $got vs $refMerges")
    // encode with the learned merges == reference tokenization counts
    val enc = TextOps.bpeEncode(docs, got).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_words")))).toMap
    val docsLocal = Map(
      1L -> "low lower lowest low low", 2L -> "new newer newest new",
      3L -> "low new lower newer")
    docsLocal.foreach { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val wantTokens = ws.map(w => refSyms(w).size.toLong).sum
      assert(enc(id) == ((wantTokens, ws.length.toLong)), s"doc $id encode mismatch")
    }
  }

  test("learnBpe stops when no pairs remain") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // single-character words: zero adjacent pairs, zero merges
    assert(TextOps.learnBpe(docs, 4) == Seq())
  }

  test("unigramSeed counts every substring occurrence, freq-weighted") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val seed = TextOps.unigramSeed(docs, maxPieceLen = 2)
      .as[(String, Long)].collect().toMap
    // "ab" freq 2: pieces a(2), b(2), ab(2); "b" freq 1: b(1)
    assert(seed == Map("a" -> 2L, "b" -> 3L, "ab" -> 2L))
  }

  test("unigram Viterbi: cheap piece wins, exact ties break lexicographic, gaps drop") {
    val docs = Seq((1L, "abc zq")).toDF("doc_id", "text")
    // "ab"+"c" and "a"+"bc" tie exactly (equal counts everywhere):
    // sep-joined "abc" < "abc" -> [a, bc] wins.
    // "zq" has no 'z' in vocab -> unsegmentable -> contributes nothing.
    val vocab = Seq("a" -> 5L, "b" -> 5L, "c" -> 5L, "ab" -> 5L, "bc" -> 5L, "q" -> 5L)
    val step = TextOps.unigramEmStep(docs, vocab)
      .as[(String, Long)].collect().toMap
    assert(step == Map("a" -> 1L, "bc" -> 1L))
    // a much more frequent (cheaper) "ab" beats the tie-break
    val vocab2 = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 1000L, "bc" -> 1L, "q" -> 1L)
    val step2 = TextOps.unigramEmStep(docs, vocab2)
      .as[(String, Long)].collect().toMap
    assert(step2 == Map("ab" -> 1L, "c" -> 1L))
  }

  test("unigram EM step re-estimates toward the dominant piece") {
    // corpus dominated by "abab": after one E-step under the seed model,
    // the 2-char piece "ab" should carry more weight than any other
    // 2-char piece, and every word stays fully covered
    val docs = Seq((1L, "abab abab abab cd")).toDF("doc_id", "text")
    val seed = TextOps.unigramSeed(docs, maxPieceLen = 2)
      .as[(String, Long)].collect().toSeq
    val step = TextOps.unigramEmStep(docs, seed)
      .as[(String, Long)].collect().toMap
    assert(step.getOrElse("ab", 0L) >= step.filter(_._1.length == 2).values.max)
    // coverage: "abab" x3 and "cd" x1 all segmented (some piece rows exist
    // for both words' characters)
    assert(step.values.sum > 0)
  }

  test("unigramEncode: per-doc token counts from the Viterbi paths; gaps count as words") {
    val docs = Seq((1L, "abab cd cd"), (2L, "zq ab")).toDF("doc_id", "text")
    // "ab" is cheap (dominant): "abab" -> [ab, ab]; "cd" -> [c, d];
    // "zq" has no 'z' -> empty segmentation -> 0 tokens, still a word
    val vocab = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "q" -> 1L, "ab" -> 1000L)
    val got = TextOps.unigramEncode(docs, vocab)
      .as[(Long, Long, Long)].collect()
      .map { case (id, t, w) => id -> ((t, w)) }.toMap
    assert(got == Map(1L -> ((6L, 3L)), 2L -> ((1L, 2L))))
    // the FromWords face (shared corpus groupBy) equals the docs face
    val words = TextOps.bpeWords(docs).select(col("word"), col("freq"))
    val fromWords = TextOps.unigramEncodeFromWords(docs, words, vocab)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fromWords ==
      TextOps.unigramEncode(docs, vocab)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq)
  }

  test("unigramPrune: dominant piece ranks first; char fallback prices the loss") {
    val docs = Seq((1L, "abab abab abab xy")).toDF("doc_id", "text")
    val seed = TextOps.unigramSeed(docs, maxPieceLen = 2)
      .as[(String, Long)].collect().toSeq
    val kept = TextOps.unigramPrune(docs.sparkSession.createDataFrame(
        docs.sparkSession.sparkContext.parallelize(seed.map(t => org.apache.spark.sql.Row(t._1, t._2))),
        org.apache.spark.sql.types.StructType.fromDDL("piece STRING, cnt LONG")), keep = 3)
      .orderBy(col("rank")).as[(String, Long, Long, Long)].collect().toSeq
    // "ab" occurs 6x (twice in each "abab") — removing it costs the most
    assert(kept.head._1 == "ab" && kept.head._4 == 1L)
    assert(kept.forall(_._3 >= 0L)) // char fallback never beats the piece
    // the words face equals the docs face
    val words = TextOps.bpeWords(docs).select(col("word"), col("freq"))
    val fromWords = TextOps.unigramSeedFromWords(words, maxPieceLen = 2)
      .as[(String, Long)].collect().toSeq.sorted
    assert(fromWords == seed.sorted)
  }

  test("unigramTrainFromWords runs the EM+prune schedule; unigramTrain converges") {
    // one dominant 4-char piece, two standalone chars (so the char floor
    // stays populated), and enough 2-char tail words that convergence to
    // target 4 takes two prune rounds
    val docs = Seq((1L, "abab abab abab a b cdef cdef gh ij kl mn"))
      .toDF("doc_id", "text")
    val words = TextOps.bpeWords(docs).select(col("word"), col("freq"))
    // explicit two-round schedule (the g_unigram_train shape): the final
    // frame is a prune — ranked 1..n, all multi-character, the dominant
    // piece first, the char-fallback loss ordering after it
    val trained = TextOps.unigramTrainFromWords(words, keeps = Seq(16, 8))
      .orderBy(col("rank")).as[(String, Long, Long, Long)].collect().toSeq
    assert(trained.map(t => (t._1, t._4)) == Seq(
      ("abab", 1L), ("cdef", 2L), ("gh", 3L), ("ij", 4L),
      ("kl", 5L), ("mn", 6L)))
    assert(trained.forall(_._3 >= 0L))
    // determinism: the schedule replays bit-equal
    val again = TextOps.unigramTrainFromWords(words, keeps = Seq(16, 8))
      .orderBy(col("rank")).as[(String, Long, Long, Long)].collect().toSeq
    assert(again == trained)
    // the convergence face shrinks the multi-char vocabulary to the
    // target (the cap starts it near 20 multi-char substrings, so the
    // 0.75-shrink schedule needs MORE than one EM+prune round); the
    // standalone chars survive as the segmentation floor
    val vocab = TextOps.unigramTrain(words, targetMultiChar = 4)
    assert(vocab.count(_._1.length >= 2) == 4)
    assert(Seq("abab", "cdef", "a", "b").forall(p => vocab.exists(_._1 == p)))
    // encode under the converged vocabulary: kl/mn fell below the target
    // and their chars were never standalone — 0 tokens, still words
    // (visible-not-dropped); everything else segments to one piece
    val enc = TextOps.unigramEncodeFromWords(docs, words, vocab)
      .as[(Long, Long, Long)].collect().head
    assert(enc == ((1L, 9L, 11L)))
  }

  test("minKProb: LM-member text outscores fresh text; novelty is its n-gram mirror") {
    val lm = (0L until 30L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val evalD = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // member: all in-LM
      (101L, "qq ww ee rr tt yy")) // fresh: every token unseen
      .toDF("doc_id", "text")
    val mink = TextOps.minKProb(evalD, lm)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(mink(100L) > mink(101L),
      s"member ${mink(100L)} should outscore fresh ${mink(101L)}")
    val nov = graft.operators.CurationOps.noveltyScore(evalD, lm, hashed = false)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(nov(100L) == 0.0, "member text has zero novel shingles")
    assert(nov(101L) == 1.0, "fresh text is fully novel")
  }
}
