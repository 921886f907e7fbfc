package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationOps, DedupOps, SimilarityOps, TemporalOps}

class TemporalCurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- TemporalOps.asOfJoin -------------------------------------------

  test("asOfJoin attaches the latest at-or-before reference per key") {
    val probe = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "tag")
    val ref = Seq((1L, 8L, "r8"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("k", "t", "v")
    val got = TemporalOps.asOfJoin(probe, ref, "k", "t", Seq("v", "t"))
      .select("tag", "asof_v", "asof_t")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(got("p1") == (("r8", 8L)))   // 8 <= 10 < 15
    assert(got("p2") == (("r15", 15L))) // latest of {8, 15}
    assert(got("p3") == ((null, null))) // ref at t=9 is AFTER probe t=5
  }

  test("asOfJoin is inclusive at equal timestamps (ref sorts before probe)") {
    val probe = Seq((1L, 10L)).toDF("k", "t")
    val ref = Seq((1L, 10L, "same-ts")).toDF("k", "t", "v")
    val got = TemporalOps.asOfJoin(probe, ref, "k", "t", Seq("v"))
      .select("asof_v").as[String].head()
    assert(got == "same-ts")
  }

  test("asOfJoin output row count equals probe row count (left semantics)") {
    val probe = Seq((1L, 1L), (1L, 2L), (3L, 9L)).toDF("k", "t")
    val ref = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    assert(TemporalOps.asOfJoin(probe, ref, "k", "t", Seq("v")).count() == 3)
  }

  // ---- TemporalOps.rangeJoin ------------------------------------------

  test("rangeJoin matches bruteforce interval containment incl. bucket edges") {
    val intervals = Seq(
      (1L, 100L, 250L, "a"), // spans buckets 1..2 at width 100
      (1L, 300L, 300L, "b"), // degenerate single-point interval
      (2L, 0L, 1000L, "c"))
      .toDF("k", "lo", "hi", "iv")
    val points = Seq(
      (1L, 99L), (1L, 100L), (1L, 199L), (1L, 250L), (1L, 251L), (1L, 300L),
      (2L, 500L), (3L, 150L))
      .toDF("k", "t")
    val got = TemporalOps.rangeJoin(intervals, points, "k", "lo", "hi", "t", 100L)
      .select("iv", "t").as[(String, Long)].collect().toSet
    val brute = intervals.as[(Long, Long, Long, String)].collect().flatMap {
      case (k, lo, hi, iv) =>
        points.as[(Long, Long)].collect().collect {
          case (pk, t) if pk == k && t >= lo && t <= hi => (iv, t)
        }
    }.toSet
    assert(got == brute)
    assert(got == Set(("a", 100L), ("a", 199L), ("a", 250L), ("b", 300L), ("c", 500L)))
  }

  test("rangeJoin emits each (interval, point) match exactly once") {
    val intervals = Seq((1L, 0L, 999L, "wide")).toDF("k", "lo", "hi", "iv")
    val points = Seq((1L, 500L)).toDF("k", "t")
    // interval spans 10 buckets at width 100; the point matches once, not 10x
    assert(TemporalOps.rangeJoin(intervals, points, "k", "lo", "hi", "t", 100L).count() == 1)
  }

  // ---- CurationOps ------------------------------------------------------

  test("shingleRows builds k-grams and falls back to whole text below k tokens") {
    val docs = Seq((1L, "a b c d"), (2L, "xy")).toDF("doc_id", "text")
    val got = CurationOps.shingleRows(docs, k = 3, hashed = false)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d"), (2L, "xy")))
  }

  test("hashed and string shingles agree on per-doc distinct counts") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // repeated trigrams
      (2L, "the quick brown fox jumps")).toDF("doc_id", "text")
    def counts(hashed: Boolean) =
      CurationOps.shingleRows(docs, 3, hashed = hashed)
        .groupBy("doc_id").agg(countDistinct("shingle").as("d"))
        .as[(Long, Long)].collect().toMap
    assert(counts(hashed = true) == counts(hashed = false))
  }

  test("contamination finds exactly the train docs sharing an eval shingle") {
    val train = Seq(
      (10L, "alpha beta gamma delta"), // shares "alpha beta gamma"
      (11L, "unrelated text entirely here")).toDF("doc_id", "text")
    val eval0 = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = CurationOps.contamination(train, eval0, k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L))
  }

  test("repetitionRatio is 0 for all-distinct and rises with repeats") {
    val docs = Seq(
      (1L, "a b c d e"),         // 3 distinct trigrams / 3
      (2L, "a b a b a b a b")).toDF("doc_id", "text") // heavy repetition
    val got = CurationOps.repetitionRatio(docs, k = 3, hashed = false)
      .select("doc_id", "repetition").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0)
    // 6 trigrams, 2 distinct ("a b a", "b a b") -> 1 - 2/6 = 0.6666
    assert(got(2L) == 0.6666)
  }

  test("tokenPacking never starts a doc at/after capacity boundary incorrectly") {
    val docs = Seq(
      (1L, "en", "w w w w"),  // 4 tokens, cum-before 0  -> bin 0
      (2L, "en", "w w w"),    // 3 tokens, cum-before 4  -> bin 0
      (3L, "en", "w w"),      // 2 tokens, cum-before 7  -> bin 0
      (4L, "en", "w"),        // 1 token,  cum-before 9  -> bin 1
      (5L, "de", "w w w w w w w w w w")) // separate stratum -> bin 0
      .toDF("doc_id", "lang", "text")
    val got = CurationOps.tokenPacking(docs, capacity = 8L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("tokenPacking two-phase prefix sum: one stratum spreads over many chunks") {
    // 40 docs, ONE stratum — the round-2 verdict scale-killer shape. With
    // chunkSize=8 the running sum is windowed by (stratum, chunk): 5 window
    // groups instead of 1, so a single hot stratum parallelizes.
    val docs = (1L to 40L).map(i => (i, "en", ("w " * (i % 5 + 1).toInt).trim))
      .toDF("doc_id", "lang", "text")
    val got = CurationOps.tokenPacking(docs, capacity = 10L, chunkSize = 8L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // reference: the one-window formulation (chunkSize larger than any id)
    val ref = CurationOps.tokenPacking(docs, capacity = 10L, chunkSize = 1L << 30)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(got == ref, s"chunked bins diverge: $got vs $ref")
    // the summing stage partitions by (stratum, chunk) — multiple window
    // groups for one stratum (the >1-task property at scale)
    val plan = CurationOps.tokenPacking(docs, capacity = 10L, chunkSize = 8L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("chunk"), s"no chunk key in the summing stage:\n$plan")
    val nGroups = docs.select(floor(col("doc_id") / 8L)).distinct().count()
    assert(nGroups == 6) // ids 1..40 span chunks 0..5
  }

  test("curationPipeline: stages compose — filtered docs gone, exact dups keep min id, shared paragraphs gutted") {
    // doc 1/2: identical text (exact dups, both pass quality — long enough,
    // stopwords, no punct). doc 3: shares 1's first 4-token paragraph but
    // has its own second paragraph. doc 4: punctuation bomb, fails quality.
    val good = "the quick brown fox and the lazy dog ran to a big red barn door"
    val docs = Seq(
      (1L, good), (2L, good),
      (3L, "the quick brown fox went back in time to visit a very old friend"),
      (4L, "!!! ??? ... !!! ??? ... !!! ???"),
    ).toDF("doc_id", "text")
    val got = CurationOps.curationPipeline(docs, chunkSize = 4, logitThreshold = 0.0)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("split"), r.getAs[Long]("n_paras_kept"),
          r.getAs[Long]("n_paras_dropped"), r.getAs[Int]("n_clean_tokens"))))
      .toMap
    // 4 dropped by quality (punct term -8 * ~0.77 dominates), 2 dropped as
    // an exact dup of 1; docs 1 and 3 survive
    assert(got.keySet == Set(1L, 3L))
    // doc 1 (15 tokens): paragraphs of 4/4/4/3 tokens, all first occurrences
    assert(got(1L) == (("train", 4L, 0L, 15)))
    // doc 3 (14 tokens): its first paragraph ("the quick brown fox") lost
    // to doc 1's; 4+4+2 tokens survive
    assert(got(3L) == (("train", 3L, 1L, 10)))
  }

  test("shuffleShards is a permutation: distinct keys, full shard coverage, seed-stable") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = CurationOps.shuffleShards(docs, nShards = 4, seed = 7L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("sort_key"), r.getAs[Long]("shard")))).toMap
    // injective on [0, P): 200 distinct ids -> 200 distinct keys
    assert(a.values.map(_._1).toSet.size == 200)
    assert(a.values.map(_._2).toSet == Set(0L, 1L, 2L, 3L))
    assert(a.forall { case (_, (k, s)) => s == k % 4 })
    // same seed reproduces bit-identically; a different seed reorders
    val b = CurationOps.shuffleShards(docs, nShards = 4, seed = 7L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("sort_key"), r.getAs[Long]("shard")))).toMap
    assert(a == b)
    val c = CurationOps.shuffleShards(docs, nShards = 4, seed = 8L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sort_key")).toMap
    assert(a.map { case (id, (k, _)) => id -> k } != c)
  }

  test("property: shuffleShards keys land in [0, P) and fold ids >= P consistently") {
    import spark.implicits._
    val P = 2147483647L
    // adversarial ids: 0, P-1, P (folds to 0's class), P+1, a huge id
    val ids = Seq(0L, P - 1, P, P + 1, 7L * P + 3, 123456789012345L)
    val got = CurationOps.shuffleShards(ids.map((_, "x")).toDF("doc_id", "text"), 8, 5L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sort_key")).toMap
    assert(got.values.forall(k => k >= 0 && k < P))
    // congruent ids (mod P) share a key — the documented folding contract
    assert(got(0L) == got(P))
    assert(got(P + 1) == ((1L * 62089911L + 5L) % P))
  }

  test("property: canonicalPerCluster equals the brute-force election on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 30L
      val docs = (1L to n).map(i => (i, 1L + rnd.nextInt(5)))
      val scores = docs.toMap
      // a valid random partition: disjoint groups over a random subset,
      // labeled by their min member (the CC operators' contract)
      val groups = rnd.shuffle((1L to n).toList).take(20)
        .grouped(1 + rnd.nextInt(5)).toSeq
      val byCluster = groups.flatMap(g => g.map(_ -> g.min)).toMap
      val expected = groups.flatMap { g =>
        val rep = g.maxBy(id => (scores(id), -id))
        g.map(id => id -> ((g.min, if (id == rep) 1L else 0L)))
      }.toMap ++
        (1L to n).filterNot(byCluster.contains).map(id => id -> ((id, 1L))).toMap
      val got = DedupOps.canonicalPerCluster(
          docs.toDF("doc_id", "n_chars"),
          byCluster.toSeq.toDF("doc_id", "cluster_id"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected)
    }
  }

  test("writeTrainingShards lays out shard dirs with key-sorted files") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = tmpDir()
    CurationOps.writeTrainingShards(docs, dir, nShards = 4, seed = 3L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    assert(back.select("shard").distinct().collect().map(_.getInt(0)).toSet
      == Set(0, 1, 2, 3))
    // within every file, rows are in sort_key order (the trainer's
    // sequential-read contract)
    val byFile = back
      .select(input_file_name().as("f"), col("sort_key"))
      .collect().groupBy(_.getString(0))
      .map { case (_, rows) => rows.map(_.getAs[Long]("sort_key")).toSeq }
    assert(byFile.forall(ks => ks == ks.sorted))
  }

  test("stratifiedSplit buckets ids deterministically 90/5/5") {
    val docs = (0L until 200L).map(i => (i, "en", 10L)).toDF("doc_id", "lang", "n_chars")
    val got = CurationOps.stratifiedSplit(docs)
      .select("split", "n_docs").as[(String, Long)].collect().toMap
    assert(got == Map("train" -> 180L, "val" -> 10L, "test" -> 10L))
  }

  test("leakageSafeSplit: no near-dup pair straddles the split; singletons use own id") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different content about spark engines"),
      (95L, "der schnelle braune fuchs springt ueber den hund"),
    ).toDF("doc_id", "text")
    val pairs = DedupOps.minHashNearDups(docs, threshold = 0.5)
    val assign = DedupOps.nearDupClustersStar(pairs)
    val got = CurationOps.leakageSafeSplit(docs, assign).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("group_id"), r.getAs[String]("split")))).toMap
    // every doc present exactly once
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 95L))
    // paired docs share a group and therefore a side
    val pairRows = pairs.collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    assert(pairRows.nonEmpty)
    pairRows.foreach { case (a, b) =>
      assert(got(a)._1 == got(b)._1, s"pair ($a,$b) split across groups")
      assert(got(a)._2 == got(b)._2, s"pair ($a,$b) leaks across the split")
    }
    // singletons keep their own id as the group (3's jaccard to 1 is 0.4,
    // below the 0.5 threshold — a genuine singleton)
    assert(got(3L)._1 == 3L && got(4L)._1 == 4L && got(95L)._1 == 95L)
    // the side is the permutation of the GROUP id: the exact dup 2 follows
    // doc 1's group (min id 1), not its own id
    assert(got(2L)._1 == 1L)
  }

  test("quantizeStats: symmetric int8, clamped, zero-vector safe") {
    val emb = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f)),  // maxabs 1 -> q = 127, -127, 64
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeStats(emb)
      .select("vec_id", "q_min", "q_max", "q_l1").as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((-127L, 127L, 127L + 127L + 64L)))
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  // ---- CurationOps.domainQuota ----------------------------------------

  private def quotaDocs(n: Int, domains: Int) = {
    // doc i: domain = i mod domains, length = a permuted score so rank
    // order differs from id order
    (0 until n).map { i =>
      (i.toLong, s"src${i % domains}", ((i * 37) % n + 1).toLong)
    }.toDF("doc_id", "source", "n_chars")
  }

  test("domainQuota: two-phase salted ranking equals the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = quotaDocs(200, 5)
    val got = CurationOps.domainQuota(docs, quota = 7, saltBuckets = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val expected = docs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select("doc_id", "source", "n_chars", "rank")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.groupBy(_._2).forall(_._2.size == 7))
  }

  test("domainQuota: a mega-domain is capped and survivors are its global best") {
    // one domain holds 90% of rows (the skew shape the salting exists
    // for); quota survivors must be exactly its top-3 by (n_chars, id)
    val rows = (0 until 90).map(i => (i.toLong, "mega", (i % 30).toLong + 1)) ++
      (90 until 100).map(i => (i.toLong, "tail", 5L))
    val got = CurationOps.domainQuota(rows.toDF("doc_id", "source", "n_chars"),
        quota = 3, saltBuckets = 8)
      .filter(col("source") === "mega")
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getInt(3))).toSeq
    // n_chars 30 at ids 29, 59, 89 -> ties break on id ascending
    assert(got == Seq((29L, 1), (59L, 2), (89L, 3)))
  }

  // ---- CurationOps.mixtureSample / temperatureSample -------------------

  test("mixtureSample actually downsamples a dominant stratum (skewed counts)") {
    // 10 rare docs vs 1000 dominant: rate_rare = 1, rate_dom = sqrt(1/100)
    val docs = ((0 until 10).map(i => (i.toLong, "rare")) ++
      (10 until 1010).map(i => (i.toLong, "dom"))).toDF("doc_id", "source")
    val rates = CurationOps.mixtureSample(docs)
      .select("source", "n_docs", "rate_ppm").distinct()
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rates("rare") == (10L, 1000000L), "the rarest stratum keeps everything")
    assert(rates("dom") == (1000L, math.floor(math.sqrt(10.0 / 1000.0) * 1e6).toLong),
      "the dominant stratum must be downsampled toward sqrt(n)")
    // kept counts match the id-modulus rule exactly
    val kept = CurationOps.mixtureSample(docs).filter(col("sampled"))
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val domRate = rates("dom")._2
    assert(kept("rare") == 10L)
    assert(kept("dom") == (10L until 1010L).count(id => id % 1000000L < domRate))
  }

  test("temperatureSample: deeper sqrt depth flattens less (higher dominant rate)") {
    val docs = ((0 until 10).map(i => (i.toLong, "rare")) ++
      (10 until 1010).map(i => (i.toLong, "dom"))).toDF("doc_id", "source")
    def domRate(depth: Int): Long = CurationOps.temperatureSample(docs, depth)
      .filter(col("source") === "dom")
      .select("rate_ppm").distinct().head().getLong(0)
    val r1 = domRate(1); val r2 = domRate(2); val r3 = domRate(3)
    assert(r1 < r2 && r2 < r3 && r3 < 1000000L,
      s"rates must rise with depth and stay below 1: $r1, $r2, $r3")
    assert(r2 == math.floor(math.sqrt(math.sqrt(10.0 / 1000.0)) * 1e6).toLong)
  }

  // ---- CurationOps.datasetCard ----------------------------------------

  test("datasetCard: hand-computed fixture, bit-identical across partitionings") {
    val docs = Seq(
      (1L, "a", "en", "x y z"),
      (2L, "a", "en", "x y z"),        // exact dup of 1
      (3L, "a", "de", "p q"),
      (4L, "b", "en", "lone doc here"),
    ).toDF("doc_id", "source", "lang", "text")
    def card(parts: Int) = CurationOps.datasetCard(docs.repartition(parts))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val one = card(1)
    assert(card(5) == one, "the report must not depend on the partitioning")
    val a = one.head
    assert(a._1 == "a" && a._2 == 3 && a._3 == 5 + 5 + 3 && a._4 == 3 + 3 + 2)
    assert(a._5 == 2 && a._6 == 2) // two distinct texts, two langs
    val b = one(1)
    assert(b._1 == "b" && b._2 == 1 && b._5 == 1 && b._6 == 1)
  }

  test("datasetCard approx mode: HLL cardinalities within the documented bound, rest exact") {
    val docs = (0 until 300).map { i =>
      (i.toLong, s"src${i % 3}", s"l${i % 5}", s"text body number ${i % 120} with words")
    }.toDF("doc_id", "source", "lang", "text")
    val exact = CurationOps.datasetCard(docs).orderBy("source").collect()
    val approx = CurationOps.datasetCard(docs, approx = true).orderBy("source").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      // non-distinct columns are identical
      Seq(1, 2, 3).foreach(i => assert(e.getLong(i) == a.getLong(i)))
      assert(e.getDouble(6) == a.getDouble(6))
      // HLL++ default rsd = 5%; allow 3x slack at tiny cardinalities
      Seq(4, 5).foreach { i =>
        val err = math.abs(a.getLong(i) - e.getLong(i)).toDouble / math.max(e.getLong(i), 1)
        assert(err <= 0.15, s"approx cardinality off by $err in column $i")
      }
    }
  }

  // ---- CurationOps.qualityQuantileFilter ------------------------------

  private def qualityDocs(n: Int, domains: Int) =
    (0 until n).map { i =>
      // vary token count and distinctness so quality scores spread
      val words = (0 to (i * 13) % 40).map(j => s"w${(i + j * 7) % (5 + i % 25)}")
      (i.toLong, s"src${i % domains}", words.mkString(" "))
    }.toDF("doc_id", "source", "text")

  test("qualityQuantileFilter: salted form equals the single-window dynamic-quota formulation") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{NumFns, TextFns}
    val docs = qualityDocs(120, 4)
    val got = CurationOps.qualityQuantileFilter(docs, keepFrac = 0.3, saltBuckets = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSeq
    val scored = docs.select(col("doc_id"), col("source"),
      NumFns.floorAt(TextFns.qualityScore(col("text")), 4).as("q_score"))
    val quotas = scored.groupBy(col("source"))
      .agg(ceil(lit(0.3) * count(lit(1)).cast("double")).cast("long").as("quota"))
    val w = Window.partitionBy(col("source")).orderBy(col("q_score").desc, col("doc_id"))
    val expected = scored.join(quotas, "source")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= col("quota"))
      .select("doc_id", "source", "q_score", "rank")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected)
    // each domain keeps exactly ceil(0.3 * 30) = 9 documents
    assert(got.groupBy(_._2).forall(_._2.size == 9))
  }

  test("qualityQuantileFilter: kept scores dominate dropped scores within each domain") {
    val docs = qualityDocs(80, 2)
    val kept = CurationOps.qualityQuantileFilter(docs, keepFrac = 0.25, saltBuckets = 8)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    val keptIds = kept.map(_._2).toSet
    import graft.functions.{NumFns, TextFns}
    val all = docs.select(col("doc_id"), col("source"),
        NumFns.floorAt(TextFns.qualityScore(col("text")), 4).as("q"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    all.groupBy(_._1).foreach { case (dom, rows) =>
      val (in, out) = rows.partition(r => keptIds.contains(r._2))
      // rank order is (score desc, id asc): (score, -id) lexicographic max
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val worstKept = in.map(r => (r._3, -r._2)).min(ord)
      out.foreach { r =>
        assert(ord.lt((r._3, -r._2), worstKept),
          s"domain $dom: dropped doc ${r._2} outranks a kept one")
      }
    }
  }

  // ---- CurationOps.packedSequences ------------------------------------

  test("packedSequences: shards concatenate in id order and respect bins") {
    // capacity 4, tokens per doc 2: docs 1/2 fill bin 0, docs 3/4 bin 1
    val docs = Seq(
      (1L, "en", "a b"), (2L, "en", "c d"), (3L, "en", "e f"), (4L, "en", "g h"),
      (5L, "de", "x y")
    ).toDF("doc_id", "lang", "text")
    val got = CurationOps.packedSequences(docs, capacity = 4L)
      .orderBy("lang", "bin")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(got == Seq(
      ("de", 0L, 1L, 2L, "x y"),
      ("en", 0L, 2L, 4L, "a b c d"),
      ("en", 1L, 2L, 4L, "e f g h")))
  }

  // ---- SimilarityOps.pcaProject ---------------------------------------

  test("pcaProject: dominant axis captured first, invariants hold on anisotropic data") {
    // dim 0 has 100x the variance of dims 1/2 -> the first principal
    // component is (up to sign) e0, its explained-variance share ~1,
    // and the per-component corpus energies are strictly ordered
    val emb = (1 to 60).map { i =>
      val big = if (i % 2 == 0) i.toFloat else -i.toFloat
      (i.toLong, Seq(big, (i % 3).toFloat * 0.1f, (i % 5).toFloat * 0.05f))
    }.toDF("vec_id", "embedding")
    val (proj, explained) = SimilarityOps.pcaProject(emb, k = 2)
    assert(explained.head > 0.95)
    val rows = proj.collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("proj_norm2") <=
        r.getAs[Double]("orig_norm2") * (1 + 1e-9))
    }
    val gate = SimilarityOps.pcaInvariants(emb, k = 2, varFloor = 0.9).head()
    assert(gate.getAs[Boolean]("norms_contract"))
    assert(gate.getAs[Boolean]("energy_ordered"))
    assert(gate.getAs[Boolean]("var_frac_ok"))
  }

  // ---- SimilarityOps.semanticDedup ------------------------------------

  test("semanticDedup exact: earlier near-dup wins, chains drop greedily") {
    // angles 0/35/70 deg: cos(35deg)=0.819 >= 0.8, cos(70deg)=0.342 < 0.8 —
    // b loses to a; c loses to b EVEN THOUGH b itself dropped (the greedy
    // pairwise rule: any earlier near-dup drops you, SemDeDup keeps one
    // representative per neighborhood chain)
    def vec(deg: Double) = {
      val r = math.toRadians(deg); Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = Seq((1L, vec(0)), (2L, vec(35)), (3L, vec(70)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.semanticDedup(emb, threshold = 0.8, nPlanes = 0)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSeq
    assert(got == Seq((1L, true, None), (2L, false, Some(1L)), (3L, false, Some(2L))))
  }

  test("semanticDedup blocked: never drops a vector the exact rule keeps") {
    // LSH blocking only REMOVES candidate pairs -> the blocked kept set is
    // a superset of the exact kept set (precision is exact by construction)
    val emb = (1 to 40).map { i =>
      val r = math.toRadians(i * 9.0)
      (i.toLong, Seq(math.cos(r).toFloat, math.sin(r).toFloat, (i % 3).toFloat))
    }.toDF("vec_id", "embedding")
    def keptSet(planes: Int) =
      SimilarityOps.semanticDedup(emb, threshold = 0.9, nPlanes = planes)
        .filter(col("kept")).select("vec_id").as[Long].collect().toSet
    val exact = keptSet(0)
    val blocked = keptSet(3)
    assert(exact.subsetOf(blocked))
    assert(exact.size < 40) // the threshold actually bites on this fixture
  }

  test("semanticDedupKMeans: superset of exact keepers, every drop names a true near-dup") {
    // the paper's k-means blocking must satisfy the same approximation
    // contract as the LSH blocking: cells only REMOVE candidate pairs, so
    // the kept set is a superset of the exact rule's, and each dropped
    // vector's dup_of is a genuine earlier near-duplicate
    val emb = (1 to 40).map { i =>
      val r = math.toRadians(i * 9.0)
      (i.toLong, Seq(math.cos(r).toFloat, math.sin(r).toFloat, (i % 3).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = SimilarityOps.semanticDedup(emb, threshold = 0.9, nPlanes = 0)
      .filter(col("kept")).select("vec_id").as[Long].collect().toSet
    val km = SimilarityOps.semanticDedupKMeans(emb, threshold = 0.9, k = 4, nIters = 2)
    val kmKept = km.filter(col("kept")).select("vec_id").as[Long].collect().toSet
    assert(exact.subsetOf(kmKept))
    assert(exact.size < 40)
    // validity of every drop: dup_of < vec_id and cosine >= threshold
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    km.filter(!col("kept")).select("vec_id", "dup_of").collect().foreach { r =>
      val (id, dupOf) = (r.getLong(0), r.getLong(1))
      assert(dupOf < id)
      assert(SimilarityOps.cosineOf(vecs(dupOf), vecs(id)) >= 0.9)
    }
  }

  test("prototypePrune: per-cell floor counts, hardest/easiest orientations, pct edges") {
    val emb = (1 to 41).map { i =>
      val r = math.toRadians(i * 9.0)
      (i.toLong, Seq(math.cos(r).toFloat, math.sin(r).toFloat, (i % 3).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = SimilarityOps.ivfCentroids(emb, k = 4, nIters = 2)
    def rows(keepPct: Int, hardest: Boolean) =
      SimilarityOps.prototypePrune(emb, cents, keepPct, hardest).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val hard = rows(50, hardest = true)
    hard.groupBy(_._2).foreach { case (cell, rs) =>
      val kept = rs.filter(_._4)
      assert(kept.length == rs.length * 50 / 100, s"cell $cell keep count")
      if (kept.nonEmpty && kept.length < rs.length) {
        // hardest mode keeps the LOW-prototypicality tail
        assert(kept.map(_._3).max <= rs.filterNot(_._4).map(_._3).min,
          s"cell $cell kept an easier example than a dropped one")
      }
    }
    val easy = rows(50, hardest = false)
    easy.groupBy(_._2).foreach { case (cell, rs) =>
      val kept = rs.filter(_._4)
      if (kept.nonEmpty && kept.length < rs.length) {
        assert(kept.map(_._3).min >= rs.filterNot(_._4).map(_._3).max,
          s"cell $cell easiest-mode kept a harder example than a dropped one")
      }
    }
    assert(rows(0, hardest = true).forall(!_._4), "keepPct=0 must keep nothing")
    assert(rows(100, hardest = true).forall(_._4), "keepPct=100 must keep everything")
  }

  test("semanticDedupKnn: exact full-k graph == all-pairs rule; truncated graph under-drops with valid dup_ofs") {
    val emb = (1 to 40).map { i =>
      val r = math.toRadians(i * 9.0)
      (i.toLong, Seq(math.cos(r).toFloat, math.sin(r).toFloat, (i % 3).toFloat))
    }.toDF("vec_id", "embedding")
    val centroids = SimilarityOps.ivfCentroids(emb, k = 4, nIters = 2)
    val exactRule = SimilarityOps.semanticDedup(emb, threshold = 0.9, nPlanes = 0)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // probe-all graph with k covering every possible neighbor: the
    // graph-routed rule must equal the all-pairs rule INCLUDING dup_of
    val fullGraph = SimilarityOps.knnGraph(emb, centroids, k = 39, nProbe = 4)
    val viaFull = SimilarityOps.semanticDedupKnn(emb, fullGraph, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(viaFull == exactRule, "full-k graph rule diverged from the all-pairs rule")
    assert(exactRule.values.count(!_._1) > 0, "fixture has no near-dups — asserts are vacuous")
    // truncated graph (k=3): drops are a subset, and every drop names a
    // genuine earlier near-dup
    val small = SimilarityOps.knnGraph(emb, centroids, k = 3, nProbe = 4)
    val viaSmall = SimilarityOps.semanticDedupKnn(emb, small, threshold = 0.9).collect()
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    viaSmall.filter(!_.getBoolean(1)).foreach { r =>
      val (id, dupOf) = (r.getLong(0), r.getLong(2))
      assert(!exactRule(id)._1, s"$id dropped by graph rule but kept by all-pairs")
      assert(dupOf < id && SimilarityOps.cosineOf(vecs(dupOf), vecs(id)) >= 0.9,
        s"$id dup_of $dupOf is not a true near-dup")
    }
  }

  test("unimaxAllocationBucketed == unimaxAllocation on random domain counts (incl. nRanges=1 and budget edges)") {
    // the two-phase variant's contract: identical allocation TO THE TOKEN
    // without any unpartitioned domains-sized window — random source
    // counts, token sizes, epoch caps, budgets (incl. 0, tighter-than-
    // smallest-cap, and larger-than-sum), and bucket counts
    val rnd = new scala.util.Random(20260814L)
    (1 to 8).foreach { trial =>
      val nSrc = 1 + rnd.nextInt(60)
      val docs = (0 until nSrc).flatMap { s =>
        (0 until 1 + rnd.nextInt(4)).map { d =>
          (f"host$s%03d", Seq.fill(rnd.nextInt(50))("w").mkString(" "))
        }
      }.toDF("source", "text")
      val sumTokens = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
      val epochCap = 1 + rnd.nextInt(3)
      val budgets = Seq(0L, 1L + rnd.nextInt(10).toLong,
        math.max(1L, sumTokens / 2), sumTokens * epochCap + 7L)
      val nRanges = Seq(1, 3, 64)(trial % 3)
      budgets.foreach { b =>
        def rows(df: org.apache.spark.sql.DataFrame) =
          df.orderBy("source").collect().map(_.toSeq).toSeq
        val single = rows(CurationOps.unimaxAllocation(docs, b, epochCap))
        val two = rows(CurationOps.unimaxAllocationBucketed(docs, b, epochCap, nRanges))
        assert(two == single,
          s"trial=$trial budget=$b epochCap=$epochCap nRanges=$nRanges diverged")
      }
    }
  }
}
