package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.TimeFns
import graft.operators.{CommitAggregator, EventStoreOps, PagingToken}
import graft.sources.Storage

/** The ScalaCheck properties promised in SURVEY.md §5: append∘load =
  * identity, reassembly invariance, calendar-exact pid math, token codec. */
class PropertySpec extends SparkSpec {

  private def checkProp(p: Prop, minSuccessful: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  test("property: nextPid matches real calendar arithmetic for any date") {
    val dates = Gen.choose(0L, 365L * 200).map(java.time.LocalDate.ofEpochDay)
    checkProp(Prop.forAll(dates) { d =>
      TimeFns.nextPidOf(TimeFns.pidOf(d)) == TimeFns.pidOf(d.plusDays(1))
    })
  }

  test("property: paging token codec round-trips any (rev, pos, hasMore)") {
    checkProp(Prop.forAll { (rev: Int, pos: Int, more: Boolean) =>
      val t = PagingToken.Token(rev, pos, more)
      PagingToken.decode(PagingToken.encode(t)).contains(t)
    })
  }

  val commitsGen: Gen[Seq[(String, Int, Long, Seq[String], Seq[String])]] = for {
    nAggs <- Gen.choose(1, 4)
    commits <- Gen.sequence[Seq[(String, Int, Long, Seq[String], Seq[String])], (String, Int, Long, Seq[String], Seq[String])](
      (0 until nAggs).flatMap { a =>
        (1 to 1 + a % 3).map { rev =>
          for {
            nPriv <- Gen.choose(1, 3)
            nPub <- Gen.choose(0, 2)
          } yield (s"agg-$a", rev, 1000L * rev,
            (0 until nPriv).map(i => s"p$i"),
            (0 until nPub).map(i => s"pub$i"))
        }
      })
  } yield commits

  test("property: commitToRows then reassembleCommits is the identity on commits") {
    val schema = StructType(Seq(
      StructField("id", BinaryType), StructField("rev", IntegerType),
      StructField("ts", LongType),
      StructField("events", ArrayType(BinaryType)),
      StructField("publicEvents", ArrayType(BinaryType))))
    checkProp(Prop.forAllNoShrink(commitsGen) { commits =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(commits.map { case (id, rev, ts, evs, pubs) =>
          Row(id.getBytes, rev, ts, evs.map(_.getBytes), pubs.map(_.getBytes))
        }),
        schema)
      val back = EventStoreOps.reassembleCommits(Storage.commitToRows(df)).collect()
      val got = back.map { r =>
        (new String(r.getAs[Array[Byte]]("id")), r.getAs[Int]("rev"), r.getAs[Long]("ts"),
          r.getSeq[Row](r.fieldIndex("events")).map(e => new String(e.getAs[Array[Byte]]("data"))).toSeq,
          r.getSeq[Row](r.fieldIndex("publicEvents")).map(e => new String(e.getAs[Array[Byte]]("data"))).toSeq)
      }.toSet
      got == commits.toSet
    }, minSuccessful = 8)
  }

  test("property: nearDupClusters equals a reference union-find on random pair lists") {
    import spark.implicits._
    val pairsGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(2, 30) // node id space
      m <- Gen.choose(1, 40) // edges (chains, cliques, crossings all arise)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es
    checkProp(Prop.forAll(pairsGen) { pairs =>
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      val got = graft.operators.DedupOps
        .nearDupClusters(pairs.toDF("id1", "id2"), maxIter = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotStar = graft.operators.DedupOps
        .nearDupClustersStar(pairs.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected && gotStar == expected
    }, minSuccessful = 8)
  }

  test("property: incremental CC over (prior assignment + new edges) == full recompute") {
    import spark.implicits._
    val gen: Gen[(Seq[(Long, Long)], Seq[(Long, Long)])] = for {
      n <- Gen.choose(2, 25)
      mPrior <- Gen.choose(0, 25)
      mNew <- Gen.choose(1, 25)
      mk = (m: Int) => Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
      prior <- mk(mPrior)
      fresh <- mk(mNew)
    } yield (prior, fresh)
    checkProp(Prop.forAll(gen) { case (prior, fresh) =>
      val full = graft.operators.DedupOps
        .nearDupClustersStar((prior ++ fresh).toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prevAssign =
        if (prior.isEmpty)
          Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
        else graft.operators.DedupOps.nearDupClustersStar(prior.toDF("id1", "id2"))
      val inc = graft.operators.DedupOps
        .nearDupClustersIncremental(prevAssign, fresh.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the incremental run sees only prior ENDPOINT nodes + new-edge
      // nodes — the same node set the full recompute sees
      inc == full
    }, minSuccessful = 8)
  }

  test("property: paragraphDedup equals a driver-side first-occurrence reference") {
    import spark.implicits._
    // small alphabet so cross-doc and in-doc duplicates arise constantly
    val parasGen: Gen[Seq[(Long, Int, String)]] = for {
      nDocs <- Gen.choose(1, 6)
      perDoc <- Gen.listOfN(nDocs,
        Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf("p q", "r s", "t u", "v w"))))
    } yield perDoc.zipWithIndex.flatMap { case (ps, d) =>
      ps.zipWithIndex.map { case (p, i) => (d.toLong, i, p) }
    }
    checkProp(Prop.forAll(parasGen) { rows =>
      rows.isEmpty || {
        // reference: scan in (doc_id, idx) order, keep first occurrences
        val seen = scala.collection.mutable.Set.empty[String]
        val keptRef = rows.sortBy(r => (r._1, r._2)).filter(r => seen.add(r._3)).toSet
        val expected = rows.groupBy(_._1).map { case (d, rs) =>
          val kept = rs.sortBy(_._2).filter(keptRef)
          d -> ((kept.map(_._3).mkString(" "), kept.size.toLong, (rs.size - kept.size).toLong))
        }
        val results = Seq(false, true).map { hashed =>
          graft.operators.DedupOps
            .paragraphDedup(rows.toDF("doc_id", "idx", "para"), hashed = hashed)
            .collect()
            .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
        }
        results.forall(_ == expected)
      }
    }, minSuccessful = 8)
  }

  test("property: paragraphDedupAgainst equals reference corpus-miss + increment-first") {
    import spark.implicits._
    val gen: Gen[(Seq[(Long, Int, String)], Seq[String])] = for {
      incRows <- Gen.listOfN(8, for {
        d <- Gen.choose(0L, 3L); i <- Gen.choose(0, 4)
        p <- Gen.oneOf("p q", "r s", "t u", "v w")
      } yield (d, i, p))
      // WITH duplicates: the flag pass must treat corpus multiplicity as
      // presence (a compaction overlap window duplicates index keys) —
      // never multiply increment rows or change the keep-set
      corpus <- Gen.choose(0, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("p q", "r s", "t u", "v w")))
    } yield (incRows.distinctBy(r => (r._1, r._2)), corpus)
    checkProp(Prop.forAll(gen) { case (rows, corpus) =>
      rows.isEmpty || {
        val corpusSet = corpus.toSet
        val seen = scala.collection.mutable.Set.empty[String]
        val keptRef = rows.sortBy(r => (r._1, r._2))
          .filter(r => !corpusSet(r._3) && seen.add(r._3)).toSet
        val expected = rows.groupBy(_._1).map { case (d, rs) =>
          val kept = rs.sortBy(_._2).filter(keptRef)
          d -> ((kept.map(_._3).mkString(" "), kept.size.toLong, (rs.size - kept.size).toLong))
        }
        val corDf = corpus.zipWithIndex.map { case (p, i) => (100L + i, 0, p) }
          .toDF("doc_id", "idx", "para")
        Seq(false, true).forall { hashed =>
          val got = graft.operators.DedupOps
            .paragraphDedupAgainst(rows.toDF("doc_id", "idx", "para"), corDf,
              hashed = hashed)
            .collect()
            .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
          got == expected
        }
      }
    }, minSuccessful = 8)
  }

  test("property: asOfJoin equals the per-row latest-at-or-before reference") {
    import spark.implicits._
    val frameGen: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Long)])] = for {
      nKeys <- Gen.choose(1, 4)
      probes <- Gen.listOfN(12, for {
        k <- Gen.choose(0L, nKeys.toLong); t <- Gen.choose(0L, 20L)
      } yield (k, t))
      refs <- Gen.listOfN(10, for {
        k <- Gen.choose(0L, nKeys.toLong); t <- Gen.choose(0L, 20L)
      } yield (k, t))
    } yield (probes, refs.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
    checkProp(Prop.forAll(frameGen) { case (probes, refs0) =>
      // asOfJoin requires one ref row per (key, ts): pre-reduce like callers do
      val refs = refs0.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val probeDf = probes.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("probe_id", "k", "t")
      val refDf = refs.toDF("k", "t", "payload")
      val got = graft.operators.TemporalOps
        .asOfJoin(probeDf, refDf, "k", "t", Seq("payload"))
        .collect()
        .map(r => r.getAs[Long]("probe_id") -> Option(r.getAs[Any]("asof_payload")))
        .toMap
      val expected = probes.zipWithIndex.map { case ((k, t), i) =>
        val eligible = refs.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (eligible.isEmpty) None
                     else Some(eligible.maxBy(r => (r._2, r._3))._3))
      }.toMap
      got == expected.map { case (k, v) => k -> v.map(_.asInstanceOf[Any]) }
    }, minSuccessful = 10)
  }

  test("rangeJoin fails loudly on an interval spanning too many buckets") {
    import spark.implicits._
    val intervals = Seq((1L, 0L, 10000000L)).toDF("k", "lo", "hi")
    val points = Seq((1L, 5L)).toDF("k", "t")
    val ex = intercept[Exception] {
      graft.operators.TemporalOps.rangeJoin(
        intervals, points, "k", "lo", "hi", "t",
        bucketWidth = 10L, maxBucketsPerInterval = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rangeJoin")), s"unexpected error: $ex")
  }

  test("typed CommitAggregator matches the untyped reassembly") {
    val schema = StructType(Seq(
      StructField("id", BinaryType), StructField("rev", IntegerType),
      StructField("ts", LongType),
      StructField("events", ArrayType(BinaryType)),
      StructField("publicEvents", ArrayType(BinaryType))))
    val commits = Seq(
      Row("a".getBytes, 1, 100L, Seq("e1".getBytes), Seq("p1".getBytes, "p2".getBytes)),
      Row("a".getBytes, 2, 200L, Seq("e2".getBytes, "e3".getBytes), Seq.empty[Array[Byte]]),
      Row("b".getBytes, 1, 300L, Seq("x".getBytes), Seq.empty[Array[Byte]]))
    val rows = Storage.commitToRows(
      spark.createDataFrame(spark.sparkContext.parallelize(commits), schema))
    val typed = CommitAggregator.eventStreams(rows).collect()
      .map { case (idB64, cs) =>
        new String(java.util.Base64.getDecoder.decode(idB64)) ->
          cs.map(c => (c.rev, c.ts, c.events.map(e => new String(e.data)),
            c.publicEvents.map(e => new String(e.data))))
      }.toMap
    assert(typed("a") == Seq(
      (1, 100L, Seq("e1"), Seq("p1", "p2")),
      (2, 200L, Seq("e2", "e3"), Seq.empty)))
    assert(typed("b") == Seq((1, 300L, Seq("x"), Seq.empty)))
  }

  test("property: DerivedLongBounds bound math is an exact equivalence") {
    // the rule only needs implication (original => derived), but the
    // bounds are in fact tight: div(x, d) >= lo <=> x >= lowerBoundFor,
    // div(x, d) <= hi <=> x <= upperBoundFor — for BOTH division
    // semantics (SQL DIV truncates toward zero, ldiv floors)
    import graft.plans.DerivedLongBounds.{lowerBoundFor, upperBoundFor}
    val xs = Gen.choose(-1000000000000000L, 1000000000000000L)
    val ds = Gen.choose(1L, 1000000L)
    val bs = Gen.choose(-1000000000L, 1000000000L)
    checkProp(Prop.forAll(xs, ds, bs) { (x, d, lo) =>
      ((x / d >= lo) == (x >= lowerBoundFor(lo, d, isFloor = false))) &&
      ((Math.floorDiv(x, d) >= lo) == (x >= lowerBoundFor(lo, d, isFloor = true)))
    })
    checkProp(Prop.forAll(xs, ds, bs) { (x, d, hi) =>
      ((x / d <= hi) == (x <= upperBoundFor(hi, d, isFloor = false))) &&
      ((Math.floorDiv(x, d) <= hi) == (x <= upperBoundFor(hi, d, isFloor = true)))
    })
    // the multiply transport (ts_ns = ts_us * 1000 on the NTZ layout) is
    // tight the same way: x*d >= lo <=> x >= lowerBoundForMul, x*d <= hi
    // <=> x <= upperBoundForMul — every sign of the bound
    import graft.plans.DerivedLongBounds.{lowerBoundForMul, upperBoundForMul}
    val mxs = Gen.choose(-4000000000000L, 4000000000000L)
    val mds = Gen.choose(1L, 1000000L)
    checkProp(Prop.forAll(mxs, mds, bs) { (x, d, lo) =>
      (x * d >= lo) == (x >= lowerBoundForMul(lo, d))
    })
    checkProp(Prop.forAll(mxs, mds, bs) { (x, d, hi) =>
      (x * d <= hi) == (x <= upperBoundForMul(hi, d))
    })
  }

  // ---- CDC boundary locality ------------------------------------------

  private def cdcBoundariesOf(bytes: Array[Byte], w: Int, div: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    val expr = graft.plans.CdcBoundaries(
      BoundReference(0, org.apache.spark.sql.types.BinaryType, nullable = true), w, div)
    expr.eval(InternalRow(bytes))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
  }

  test("property: CDC boundaries are LOCAL — every boundary survives any prefix insertion") {
    // the formal shift-resistance claim: a boundary's window contains
    // only payload bytes, so prepending k junk bytes maps every old
    // boundary p to p + k (all preserved); new boundaries can appear
    // only inside the first k + w - 1 positions (windows touching junk).
    val payloads = Gen.nonEmptyListOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)
    val prefixes = Gen.nonEmptyListOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)
    val ws = Gen.choose(2, 6)
    checkProp(Prop.forAll(payloads, prefixes, ws) { (doc, junk, w) =>
      val div = 3
      val k = junk.length
      val oldB = cdcBoundariesOf(doc, w, div)
      val newB = cdcBoundariesOf(junk ++ doc, w, div)
      val shifted = oldB.map(_ + k)
      shifted.forall(newB.contains) &&
        newB.filter(_ >= k + w - 1) == shifted.filter(_ >= k + w - 1)
    }, minSuccessful = 200)
  }

  test("property: tokenBudgetSample equals the driver prefix-sum reference for any corpus/budget/nRanges") {
    import spark.implicits._
    val corpusGen = for {
      n <- Gen.choose(1, 60)
      docs <- Gen.listOfN(n, Gen.choose(1, 12))
      budget <- Gen.choose(0L, 300L)
      nRanges <- Gen.oneOf(1, 2, 5, 17, 64)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }, budget, nRanges)
    val P = 2147483647L
    checkProp(Prop.forAll(corpusGen) { case (docs, budget, nRanges) =>
      // driver reference: global (sort_key, id) order, keep while the
      // running total's START offset is below the budget
      val keyed = docs.map { case (id, nTok) =>
        (id, ((id % P) * 62089911L + 3L) % P, nTok.toLong)
      }.sortBy(k => (k._2, k._1))
      var cum = 0L
      val expected = keyed.takeWhile { k => val keep = cum < budget; cum += k._3; keep }
        .map(_._1).toSet
      val df = docs.map { case (id, nTok) => (id, Seq.fill(nTok)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.CurationOps
        .tokenBudgetSample(df, budget, seed = 3L, nRanges = nRanges)
        .collect().map(_.getLong(0)).toSet
      got == expected
    }, minSuccessful = 12)
  }

  test("property: exactQuantiles equals the driver rank-selection reference at any bucketWidth") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(0L, 500L) // heavy ties at small ranges arise via bucketing
      } yield (g, v))
      width <- Gen.oneOf(1L, 3L, 64L, 1000L)
    } yield (rows.zipWithIndex.map { case ((g, v), i) => (i.toLong + 1, g, v) }, width)
    val ps = Seq(0.25, 0.5, 0.75)
    checkProp(Prop.forAll(gen) { case (rows, width) =>
      // driver reference: value at rank ceil(p*n) (1-indexed) per group
      val expected = rows.groupBy(_._2).map { case (g, rs) =>
        val sorted = rs.map(_._3).sorted
        g -> ps.map(p => sorted((math.ceil(p * sorted.size) - 1).toInt))
      }
      val got = graft.operators.CurationOps
        .exactQuantiles(rows.toDF("doc_id", "lang", "n_chars"), ps, bucketWidth = width)
        .collect().map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      got == expected
    }, minSuccessful = 12)
  }

  test("property: streamed quantile histogram is split-invariant (any batch partitioning == one batch)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("x", "y")
        v <- Gen.choose(0L, 40L)
      } yield (g, v))
      nSplits <- Gen.choose(1, 4)
      cuts <- Gen.listOfN(nSplits - 1, Gen.choose(0, n))
    } yield (rows.zipWithIndex.map { case ((g, v), i) => (i.toLong + 1, g, v) },
      cuts.sorted)
    val ps = Seq(0.25, 0.5, 0.75)
    checkProp(Prop.forAll(gen) { case (rows, cuts) =>
      val path = tmpDir() + "/hist"
      val bounds = (0 +: cuts) :+ rows.size
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        graft.streaming.StreamingOps.quantileBatch(
          rows.slice(a, b).toDF("doc_id", "lang", "n_chars"), i.toLong, path)
      }
      val got = graft.streaming.StreamingOps.readQuantiles(spark, path, ps)
        .collect().map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val expected = rows.groupBy(_._2).map { case (g, rs) =>
        val sorted = rs.map(_._3).sorted
        g -> ps.map(p => sorted((math.ceil(p * sorted.size) - 1).toInt))
      }
      got == expected
    }, minSuccessful = 8)
  }

  test("property: KMV bottom-k Jaccard — sparse regime EXACT, sketch bounded (k ∈ {4,64,1024})") {
    // pins the docstring claim at CurationOps.bottomKJaccard: when a
    // pair's union of content fingerprints fits k, the estimate IS the
    // exact Jaccard (sourceOverlap's truth) in identical integer ppm —
    // across skewed source sizes and all three k regimes, so a future k
    // or estimator change can't silently degrade the sparse-exact gate
    import spark.implicits._
    import graft.operators.CurationOps
    val gen = for {
      nSrc <- Gen.choose(2, 4)
      sizes <- Gen.listOfN(nSrc, Gen.choose(1, 40)) // skewed source sizes
      pool <- Gen.choose(10, 60)                    // shared-content pool width
      rows <- Gen.sequence[List[List[Int]], List[Int]](
        sizes.map(n => Gen.listOfN(n, Gen.choose(0, pool))))
    } yield rows.zipWithIndex.flatMap { case (items, s) =>
      items.map(i => (s"src$s", s"item$i"))
    }
    checkProp(Prop.forAllNoShrink(gen) { rows =>
      val docs = rows.toDF("source", "text")
      val exact = CurationOps.sourceOverlap(docs)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      Seq(4, 64, 1024).forall { k =>
        val est = CurationOps.bottomKJaccard(CurationOps.bottomKSignatures(docs, k), k)
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        est.keySet == exact.keySet && est.forall { case (pair, (nSig, _, estPpm)) =>
          val (inter, nA, nB, exactPpm) = exact(pair)
          val union = nA + nB - inter
          nSig == math.min(k.toLong, union) &&
            estPpm >= 0L && estPpm <= 1000000L &&
            (union > k || estPpm == exactPpm)
        }
      }
    }, minSuccessful = 6)
  }

  test("property: rankBuckets two-phase == single-window reference, any clumping") {
    import spark.implicits._
    val gen: Gen[(Seq[Long], Int, Long)] = for {
      n <- Gen.choose(1, 60)
      // clumped scores: few distinct values -> heavy ties; wide values ->
      // sparse ranges. Both arise across runs.
      distinct <- Gen.choose(1, 12)
      scores <- Gen.listOfN(n, Gen.choose(0, distinct - 1).map(_ * 37L))
      buckets <- Gen.choose(1, 9)
      width <- Gen.oneOf(1L, 3L, 64L, graft.operators.AssemblyOps.P)
    } yield (scores, buckets, width)
    checkProp(Prop.forAllNoShrink(gen) { case (scores, nBuckets, width) =>
      val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "score")
      val got = graft.operators.CurationOps
        .rankBuckets(df, nBuckets, rangeWidth = width)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      val n = scores.size.toLong
      val ref = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .sortBy { case (id, s) => (s, id) }.zipWithIndex
        .map { case ((id, s), r) => (id, s, r.toLong * nBuckets / n, r.toLong) }
        .sorted
      got == ref
    }, minSuccessful = 10)
  }

  test("property: packBinned == a sequential reference packer, any lengths") {
    import spark.implicits._
    val gen: Gen[(Seq[Int], Long)] = for {
      n <- Gen.choose(1, 50)
      l <- Gen.choose(2L, 24L)
      lens <- Gen.listOfN(n, Gen.choose(1, 30)) // some exceed L -> dropped
    } yield (lens, l)
    checkProp(Prop.forAllNoShrink(gen) { case (lens, l) =>
      val docs = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.AssemblyOps.packBinned(docs, l, chunkSize = 5L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      // sequential reference: per ascending length group, docs in
      // permutation order fill cap-sized sequences; groups own contiguous
      // dense seq-id ranges
      val P = graft.operators.AssemblyOps.P
      def perm(id: Long) = (id % P) * 62089911L % P
      val eligible = lens.zipWithIndex
        .collect { case (n, i) if n > 0 && n <= l => (i.toLong, n.toLong) }
      var nextSeq = 0L
      val ref = eligible.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (n, ds) =>
        val cap = l / n
        val ordered = ds.map(_._1).sortBy(id => (perm(id), id))
        val rows = ordered.zipWithIndex.map { case (id, r) =>
          (nextSeq + r / cap, (r % cap) * n, id, n)
        }
        nextSeq += (ds.size + cap - 1) / cap
        rows
      }.sorted
      got == ref
    }, minSuccessful = 10)
  }

  test("property: streamed KN3 fold → model-read == batch model, any split & minCount") {
    // guards the model-read-time <unk> vocabulary cut as it evolves: for
    // ANY corpus, batch partitioning of the LM half, and minCount, the
    // kn3CountsStream land → compactKn3Counts fold → readKn3Counts →
    // kn3Score path must be BIT-equal to the one-shot batch model
    // (kn3ScoreAgainst) — no tolerance, doubles compared exactly.
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val gen = for {
      nLm <- Gen.choose(2, 20)
      lm <- Gen.listOfN(nLm, for {
        len <- Gen.choose(1, 12)
        ws <- Gen.listOfN(len, word)
      } yield ws.mkString(" "))
      nSc <- Gen.choose(1, 8)
      sc <- Gen.listOfN(nSc, for {
        len <- Gen.choose(2, 12)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "z"))
      } yield ws.mkString(" "))
      nSplits <- Gen.choose(1, 3)
      cuts <- Gen.listOfN(nSplits - 1, Gen.choose(0, nLm))
      minCount <- Gen.choose(1L, 4L)
    } yield (lm, sc, cuts.sorted, minCount)
    checkProp(Prop.forAllNoShrink(gen) { case (lm, sc, cuts, minCount) =>
      val path = tmpDir() + "/kn3"
      val lmDf = lm.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val scDf = sc.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val bounds = (0 +: cuts) :+ lm.size
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        graft.streaming.StreamingOps.kn3Batch(
          lm.slice(a, b).zipWithIndex.map { case (t, j) => ((a + j).toLong, t) }
            .toDF("doc_id", "text"), i.toLong, path, "doc_id", "text")
      }
      graft.streaming.StreamingOps.compactKn3Counts(spark, path)
      val (uni, tri) = graft.streaming.StreamingOps.readKn3Counts(spark, path)
      val streamed = graft.operators.TextOps.kn3Score(scDf, uni, tri, minCount)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.operators.TextOps.kn3ScoreAgainst(scDf, lmDf, minCount)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      streamed == batch
    }, minSuccessful = 8)
  }
}
