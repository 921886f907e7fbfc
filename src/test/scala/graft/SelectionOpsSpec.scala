package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationOps, MultimodalOps}

/** Data-selection operators: CDC chunk-overlap near-dup pairs,
  * DSIR-style importance weights, and the exact token-budget prefix
  * sample (two-phase == single-window truth). */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        rows.map { case (i, b) => org.apache.spark.sql.Row(i, b) }).asJava,
      StructType(Seq(StructField("media_id", LongType), StructField("content", BinaryType))))
  }

  test("cdcNearDups: a prefixed re-container of a payload is found; unrelated content is not") {
    val base = Array.tabulate(600)(i => ((i * 73 + 19) % 256).toByte)
    val media = mediaOf(Seq(
      1L -> base,
      2L -> (Array[Byte](-1, 0, 77, -128, 5) ++ base), // re-containered copy
      3L -> base.map(b => (b ^ 0x55).toByte)))         // unrelated
    val pairs = MultimodalOps.cdcNearDups(media, thresholdPct = 50, w = 5, divisor = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the shifted-duplicate pair, got $pairs")
    // exact duplicate payloads reach jaccard_ppm == 1e6
    val exact = MultimodalOps.cdcNearDups(
        mediaOf(Seq(1L -> base, 2L -> base.clone())), thresholdPct = 50, w = 5, divisor = 4)
      .collect()
    assert(exact.length == 1 && exact.head.getAs[Long]("jaccard_ppm") == 1000000L)
  }

  test("cdcNearDups: hashed keys report the same pairs; maxDf caps stop-chunks") {
    val base = Array.tabulate(600)(i => ((i * 73 + 19) % 256).toByte)
    val media = mediaOf(Seq(
      1L -> base,
      2L -> (Array[Byte](9, -3) ++ base),
      3L -> base.map(b => (b ^ 0x55).toByte)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("jaccard_ppm"))).toSet
    val plain = rows(MultimodalOps.cdcNearDups(media, 50, 5, 4))
    val hashed = rows(MultimodalOps.cdcNearDups(media, 50, 5, 4, hashed = true))
    assert(plain == hashed, "hashed-key mode must not change the report")
    // maxDf = 1 drops every key present in >= 2 payloads: no pairs survive
    val capped = MultimodalOps.cdcNearDups(media, 50, 5, 4, maxDf = Some(1L)).count()
    assert(capped == 0L, "maxDf cap must suppress pair generation")
  }

  test("importanceWeights: in-domain text scores higher per token; equal under repartitioning") {
    val docs = Seq(
      (1L, "t", "alpha beta gamma alpha beta gamma alpha beta"),
      (2L, "t", "beta gamma alpha beta delta gamma alpha beta"),
      (3L, "r", "xray york zulu quebec victor whiskey xray zulu"),
      (4L, "r", "york quebec victor zulu whiskey xray york zulu"),
      (5L, "r", "alpha beta gamma alpha beta delta gamma beta"),   // in-domain raw doc
    ).toDF("doc_id", "grp", "text")
    val scored = CurationOps.importanceWeights(
      docs, targetPred = col("grp") === "t", nBuckets = 256)
    val byId = scored.collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("score"), r.getAs[Long]("n_tokens"))).toMap
    def perTok(id: Long) = byId(id)._1.toDouble / byId(id)._2
    // the in-domain raw doc dominates the out-of-domain raw docs
    assert(perTok(5L) > 5 * perTok(3L) && perTok(5L) > 5 * perTok(4L),
      s"in-domain raw doc must score far higher: ${byId}")
    // deterministic under any partitioning (integer arithmetic end to end)
    val re = CurationOps.importanceWeights(
        docs.repartition(7, col("text")), targetPred = col("grp") === "t", nBuckets = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val base = scored.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == base)
  }

  test("importanceWeights: scores equal a driver-side reference on the same bucket weights") {
    val docs = Seq(
      (1L, "t", "aa bb cc aa"),
      (2L, "r", "dd ee ff dd ee"),
      (3L, "r", "aa dd bb ee"),
    ).toDF("doc_id", "grp", "text")
    val nB = 16
    graft.plans.GraftFunctions.register(spark)
    // driver reference: same polyFp buckets (via the registered SQL fn),
    // Laplace-smoothed integer ratios, per-doc sums
    val toks = docs.select(col("doc_id"), (col("grp") === "t").as("t"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("b", pmod(graft.plans.GraftFunctions.polyFp(col("tok")), lit(nB.toLong)))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getAs[Long]("b")))
    val w = toks.groupBy(_._3).map { case (b, rs) =>
      val t = rs.count(_._2).toLong; val r = rs.size - t
      b -> ((t + 1L) * 1000000L) / (r + 1L)
    }
    val expected = toks.groupBy(_._1).map { case (id, rs) =>
      id -> rs.map(r => w(r._3)).sum
    }
    val got = CurationOps.importanceWeights(docs, col("grp") === "t", nBuckets = nB)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score")).toMap
    assert(got == expected, s"got $got, expected $expected")
  }

  test("tokenBudgetSample: two-phase selection equals the single-window truth at every nRanges") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 200L).map { i =>
      (i, Seq.fill(((i * 31 + 7) % 13).toInt + 1)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val P = 2147483647L
    val truth = docs.select(col("doc_id"),
        ((pmod(col("doc_id"), lit(P)) * lit(62089911L) + lit(5L)) % lit(P)).as("sort_key"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.orderBy(col("sort_key"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") - col("n_tokens") < 400L)
      .select("doc_id", "sort_key", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (nRanges <- Seq(1, 3, 7, 64)) {
      val got = CurationOps.tokenBudgetSample(docs, budgetTokens = 400L, seed = 5L, nRanges = nRanges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == truth, s"nRanges=$nRanges diverged from the single-window truth")
    }
  }

  test("domainTokenBudget: two-phase equals the per-domain single-window truth at every nRanges") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns
    // skewed fixture: one mega domain, one small, one below the budget
    val docs = ((1L to 120L).map(i => (i, "mega",
        Seq.tabulate(((i * 13 + 5) % 9).toInt + 2)(j => s"w${(i + j * 7) % 31}").mkString(" "))) ++
      (200L to 215L).map(i => (i, "small", s"tok${i % 5} a b c d e")) ++
      Seq((300L, "tiny", "only a few tokens here")))
      .toDF("doc_id", "source", "text")
    val scored = docs.select(col("doc_id"), col("source"),
      floor(TextFns.qualityScore(col("text")) * lit(1e4)).cast("long").as("q4"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val truth = scored
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("source")).orderBy(col("q4").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") - col("n_tokens") < 150L)
      .select("doc_id", "source", "q4", "n_tokens")
      .collect().map(_.toSeq).toSet
    for (nRanges <- Seq(1, 3, 64)) {
      val got = CurationOps.domainTokenBudget(docs, budgetTokens = 150L, nRanges = nRanges)
        .collect().map(_.toSeq).toSet
      assert(got == truth, s"nRanges=$nRanges diverged from the single-window truth")
    }
    // the below-budget domain keeps everything
    assert(CurationOps.domainTokenBudget(docs, 150L, 3)
      .filter(col("source") === "tiny").count() == 1L)
    // each over-budget domain covers its budget minimally
    val kept = CurationOps.domainTokenBudget(docs, 150L, 3)
      .filter(col("source") === "mega")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(3)))
    assert(kept.map(_._3).sum >= 150L)
    val last = kept.minBy(k => (k._1, -k._2)) // lowest quality, highest id = last kept
    assert(kept.map(_._3).sum - last._3 < 150L, "per-domain prefix must be minimal")
  }

  test("lengthHistogram: bit-length buckets are exact at power-of-two boundaries") {
    val docs = Seq((1L, "s", 1L), (2L, "s", 2L), (3L, "s", 3L), (4L, "s", 4L),
      (5L, "s", 1023L), (6L, "s", 1024L), (7L, "s", 0L))
      .toDF("doc_id", "source", "n_chars")
    val got = CurationOps.lengthHistogram(docs)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // 0 -> "0" (len 1) and 1 -> len 1; 2,3 -> len 2; 4 -> len 3; 1023 -> 10; 1024 -> 11
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 10L -> 1L, 11L -> 1L), got)
  }

  test("jsonl round trip is lossless on hostile strings and nulls") {
    val rows = Seq[(Long, String, String)](
      (1L, "en", "line one\nline two\ttabbed \"quoted\" back\\slash"),
      (2L, "zh", "中文 текст émoji  control"),
      (3L, null, null),
      (4L, "en", ""))
    val df = rows.toDF("doc_id", "lang", "text")
    val out = s"${tmpDir()}/jsonl"
    graft.sources.Tables.exportJsonl(df, out, nShards = 3)
    val back = graft.sources.Tables.importJsonl(spark, out, "doc_id LONG, lang STRING, text STRING")
      .select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // Spark's json writer drops null fields from the object; schema-on-read
    // restores them as nulls — the round trip is value-lossless
    assert(back == rows.toSet, s"round trip diverged: $back")
  }

  test("keySkewReport: exact fold with a deterministic argmax tie-break") {
    val df = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq.fill(5)(3L) ++ Seq(4L))
      .map(k => Tuple1(k)).toDF("user_id")
    val r = CurationOps.keySkewReport(df, "user_id").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((14L, 4L, 5L, 1L, 5L * 4L * 1000000L / 14L)),
      s"report diverged: $r")
  }

  test("keySkewReport: string keys work (no numeric coercion) and empty input reports zeros") {
    val urls = (Seq.fill(3)("https://a.example/x") ++ Seq("https://b.example/y"))
      .map(Tuple1(_)).toDF("url")
    val r = CurationOps.keySkewReport(urls, "url").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)) ==
      ((4L, 2L, 3L, "https://a.example/x")), s"string-key report diverged: $r")
    val empty = CurationOps.keySkewReport(
      Seq.empty[Tuple1[Long]].toDF("user_id"), "user_id").collect().head
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2), empty.getLong(4)) ==
      ((0L, 0L, 0L, 0L)), s"empty input must report zeros: $empty")
  }

  test("domainTokenBudget: null-text docs are kept (sorted last) and do not corrupt the running totals") {
    val docs = (Seq((1L, "web", "alpha beta gamma delta epsilon"),
      (2L, "web", "zeta eta theta iota kappa")) ++
      (10L to 14L).map(i => (i, "web", null: String)))
      .toDF("doc_id", "source", "text")
    // budget 7: the two real docs (5 tokens each, quality > 0) are the
    // best prefix; null docs (q4=0, 1 token each) sort last and none are
    // needed. Before the q4 coalesce, the null range's tokens inflated
    // __before and the null docs vanished from under-budget domains.
    val kept = CurationOps.domainTokenBudget(docs, budgetTokens = 7L, nRanges = 4)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"budget-7 selection diverged: $kept")
    // under a roomy budget EVERY doc survives, nulls included
    val all = CurationOps.domainTokenBudget(docs, budgetTokens = 1000L, nRanges = 4)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 10L, 11L, 12L, 13L, 14L),
      s"null-text docs must be kept under a roomy budget: $all")
  }

  test("importanceSelect: target docs define the distribution but are never selected; salted == single-window") {
    val docs = Seq(
      (1L, "t", "alpha beta gamma alpha beta gamma"),
      (2L, "t", "beta gamma alpha beta delta gamma"),
      (10L, "r", "alpha beta gamma alpha beta delta"),
      (11L, "r", "xray york zulu quebec victor whiskey"),
      (12L, "r", "york quebec victor zulu whiskey xray"),
      (13L, "r", "beta alpha gamma delta alpha beta"),
      (14L, "r", "zulu xray whiskey york victor quebec"),
    ).toDF("doc_id", "grp", "text")
    val kept = CurationOps.importanceSelect(
        docs, col("grp") === "t", keepFrac = 0.4, nBuckets = 256, saltBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // ceil(0.4 * 5 raw docs) = 2 kept; the in-domain raw docs win; no
    // target doc appears
    assert(kept.map(_._1) == Set(10L, 13L), s"selection diverged: $kept")
    val unsalted = CurationOps.importanceSelect(
        docs, col("grp") === "t", keepFrac = 0.4, nBuckets = 256, saltBuckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(unsalted == kept, "salted two-phase must equal the single-window selection")
  }

  test("cardDelta: appearing and disappearing sources report against zero") {
    val before = Seq(
      (1L, "keep", "en", "alpha beta"),
      (2L, "gone", "de", "der fuchs")).toDF("doc_id", "source", "lang", "text")
    val after = Seq(
      (1L, "keep", "en", "alpha beta"),
      (3L, "keep", "fr", "le renard brun"),
      (4L, "new", "en", "fresh content here")).toDF("doc_id", "source", "lang", "text")
    val got = CurationOps.cardDelta(before, after)
      .select("source", "n_docs", "d_n_docs", "n_langs", "d_n_langs")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("keep") == ((2L, 1L, 2L, 1L)))
    assert(got("new") == ((1L, 1L, 1L, 1L)), s"appearing source must delta from zero: $got")
    assert(got("gone") == ((0L, -1L, 0L, -1L)), s"disappearing source must report zero now: $got")
  }

  test("joinCardinality: exact product-sum over shared keys; zeros on disjoint keys") {
    val left = (Seq("a", "a", "b")).map(Tuple1(_)).toDF("lk")
    val right = (Seq("a", "a", "a", "c", "c", "c", "c")).map(Tuple1(_)).toDF("rk")
    val r = CurationOps.joinCardinality(left, "lk", right, "rk").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 6L, 6L)), r)
    val disjoint = CurationOps.joinCardinality(
      left, "lk", Seq("z").map(Tuple1(_)).toDF("rk"), "rk").collect().head
    assert((disjoint.getLong(0), disjoint.getLong(1), disjoint.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("exactQuantiles: equals plain rank selection at every bucketWidth, ties included") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 157L).map { i =>
      (i, if (i % 3 == 0) "g1" else "g2", (i * 37 + 11) % 50) // heavy ties
    }.toDF("doc_id", "lang", "n_chars")
    val ps = Seq(0.25, 0.5, 0.75)
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val v = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
    val truth = v.groupBy(col("lang")).agg(
        ps.map(p => max(when(col("rn") ===
          ceil(lit(p) * col("n").cast("double")).cast("long"), col("n_chars")))
          .as(s"p${(p * 100).round}")).head,
        ps.tail.map(p => max(when(col("rn") ===
          ceil(lit(p) * col("n").cast("double")).cast("long"), col("n_chars")))
          .as(s"p${(p * 100).round}")): _*)
      .collect().map(_.toSeq).toSet
    for (width <- Seq(1L, 7L, 64L, 10000L)) {
      val got = CurationOps.exactQuantiles(df, ps, bucketWidth = width)
        .collect().map(_.toSeq).toSet
      assert(got == truth, s"bucketWidth=$width diverged: $got vs $truth")
    }
  }

  test("tokenBudgetSample: minimal prefix covering the budget; degenerate budgets") {
    val docs = (1L to 50L).map(i => (i, Seq.fill(5)("w").mkString(" "))).toDF("doc_id", "text")
    val kept = CurationOps.tokenBudgetSample(docs, budgetTokens = 52L, seed = 0L, nRanges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = kept.map(_._3).sum
    assert(total >= 52L, s"sample must cover the budget: $total")
    // dropping the LAST kept doc (max sort key) must fall below the budget
    assert(total - kept.maxBy(k => (k._2, k._1))._3 < 52L, "prefix must be minimal")
    // budget beyond the corpus keeps everything; budget 0 keeps nothing
    assert(CurationOps.tokenBudgetSample(docs, 100000L, 0L, 4).count() == 50L)
    assert(CurationOps.tokenBudgetSample(docs, 0L, 0L, 4).count() == 0L)
  }

  test("preferencePairs: extremes pair inward; equal/self/reflected pairs dropped") {
    // domain a: scores 50..10 on ids 1..5 -> pairs (1,5),(2,4); the
    // middle element self-pairs and drops. domain b: one equal-score
    // pair -> no preference signal, drops entirely.
    val scored = Seq(
      ("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("a", 5L, 10L), ("b", 6L, 7L), ("b", 7L, 7L))
      .toDF("source", "doc_id", "score")
    val got = CurationOps.preferencePairs(scored)
      .select("source", "pair_rank", "chosen_id", "chosen_score",
        "rejected_id", "rejected_score")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq(
      ("a", 1L, 1L, 50L, 5L, 10L), ("a", 2L, 2L, 40L, 4L, 20L)))
    // repartition-invariant (the two-phase rank's determinism carries)
    val again = CurationOps.preferencePairs(scored.repartition(5))
      .select("source", "pair_rank", "chosen_id", "chosen_score",
        "rejected_id", "rejected_score")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(again == got)
  }

  test("prefPairsStream: served pairs == batch preferencePairs; replay overwrites") {
    val p = s"${tmpDir()}/pp"
    val scored = (0L until 40L).map(i => (s"src${i % 3}", i, (i * 7) % 100))
      .toDF("source", "doc_id", "score")
    val half1 = scored.filter(col("doc_id") < 20)
    val half2 = scored.filter(col("doc_id") >= 20)
    graft.streaming.StreamingOps.prefPairsBatch(half1, 0L, p, 1, 64L,
      "source", "doc_id", "score")
    graft.streaming.StreamingOps.prefPairsBatch(half2, 1L, p, 1, 64L,
      "source", "doc_id", "score")
    def served = graft.streaming.StreamingOps.readPrefPairs(spark, p)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val batch = CurationOps.preferencePairs(scored)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(served == batch)
    // checkpoint replay of the newest batch overwrites, never duplicates
    graft.streaming.StreamingOps.prefPairsBatch(half2, 1L, p, 1, 64L,
      "source", "doc_id", "score")
    assert(served == batch)
    // retention: deltas fold latest-wins (newest protected), manifest
    // versions vacuum to the newest; serving unchanged, and a refresh
    // over the folded layout recomputes identically
    graft.streaming.StreamingOps.compactPrefState(spark, p)
    def dirs(sub: String) = new java.io.File(s"$p/$sub").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs("_docs") == Seq("__batch=-1", "__batch=1"))
    assert(served == batch)
    graft.streaming.StreamingOps.vacuumScheduleManifests(spark, p)
    assert(dirs("manifest") == Seq("__batch=1"))
    graft.streaming.StreamingOps.prefPairsBatch(half2, 1L, p, 1, 64L,
      "source", "doc_id", "score")
    assert(served == batch)
  }
}
