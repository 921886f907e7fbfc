package graft

import org.apache.spark.sql.functions._
import graft.operators.{BehaviorOps, TemporalOps, TextOps}

/** Hot-key skew: the per-key window operators (sessionize, asOfJoin) place
  * one key's rows in one window partition — at 100 TB a key holding a
  * disproportionate share of the table makes that ONE task the straggler
  * (AQE splits skewed shuffle-join partitions, but not window partitions).
  * These tests pin CORRECTNESS under a 90%-hot-key distribution — the
  * semantics must not depend on how rows spread over input partitions —
  * and the operators' scaladocs document the mitigation (chunked two-phase
  * carry, same shape as CurationOps.tokenPacking). */
class SkewSpec extends SparkSpec {

  test("sessionize: one key holding 90% of rows still sessionizes exactly") {
    import spark.implicits._
    val gap = 100L
    // deterministic timeline: every 7th delta exceeds the gap
    def times(n: Int): Seq[Long] =
      (1 until n).scanLeft(0L)((t, i) => t + (if (i % 7 == 0) gap + 5 else 3))
    val hot = times(9000).zipWithIndex.map { case (t, i) => ("hot", t, i.toLong) }
    val cold = (0 until 10).flatMap { k =>
      times(100).zipWithIndex.map { case (t, i) => (s"cold$k", t, i.toLong) }
    }
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(hot ++ cold), 16)
      .toDF("user_id", "ts_us", "event_id")

    val got = BehaviorOps.sessionize(df, gapUs = gap)
    assert(got.count() == hot.size + cold.size)

    // sequential reference over the hot key's sorted timeline
    def expectedSessions(ts: Seq[Long]): Seq[Long] =
      ts.zip((-10 * gap) +: ts.dropRight(1)) // sentinel: first row opens a session
        .scanLeft(0L) { case (s, (t, prev)) => if (t - prev > gap) s + 1 else s }
        .tail
    Seq("hot", "cold3").foreach { key =>
      val rows = got.filter(col("user_id") === key)
        .select("ts_us", "session_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val exp = expectedSessions(rows.map(_._1).toSeq)
      assert(rows.map(_._2).toSeq == exp, s"session ids diverge for $key")
    }
  }

  test("sessionizeChunked == sessionize, hot key split over many chunks") {
    import spark.implicits._
    val gap = 100L
    // irregular timeline crossing many chunk boundaries, incl. gaps that
    // straddle chunk edges and empty chunks (the i%31 jump)
    def times(n: Int, seed: Long): Seq[Long] =
      (1 until n).scanLeft(seed)((t, i) =>
        t + (if (i % 31 == 0) 5000 else if (i % 7 == 0) gap + 5 else 3))
    val rows = times(8000, 0L).zipWithIndex.map { case (t, i) => ("hot", t, i.toLong) } ++
      (0 until 8).flatMap { k =>
        times(120, k * 13L).zipWithIndex.map { case (t, i) => (s"cold$k", t, i.toLong) }
      }
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 16)
      .toDF("user_id", "ts_us", "event_id")
    // chunk width 997us: thousands of chunks for the hot key, heads landing
    // both inside sessions and on session starts
    val chunked = BehaviorOps.sessionizeChunked(df, gapUs = gap, chunkWidthUs = 997L)
      .select("user_id", "event_id", "session_id")
    val plain = BehaviorOps.sessionize(df, gapUs = gap)
      .select("user_id", "event_id", "session_id")
    assert(chunked.count() == rows.size)
    assert(chunked.except(plain).isEmpty && plain.except(chunked).isEmpty,
      s"chunked diverges: ${chunked.except(plain).take(5).mkString}")
  }

  test("chunked variants stay exact for NEGATIVE timestamps (floor chunk ids)") {
    import spark.implicits._
    val gap = 100L
    // timeline straddling ts=0: truncating division (DIV) would merge the
    // chunks either side of zero into one double-width chunk; floor division
    // keeps them uniform, so chunked == plain must hold here too
    def times(n: Int): Seq[Long] =
      (1 until n).scanLeft(-40000L)((t, i) => t + (if (i % 7 == 0) gap + 5 else 29))
    val rows = times(3000).zipWithIndex.map { case (t, i) => ("hot", t, i.toLong) } ++
      times(80).zipWithIndex.map { case (t, i) => ("cold", t, i.toLong) }
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 16)
      .toDF("user_id", "ts_us", "event_id")
    val chunked = BehaviorOps.sessionizeChunked(df, gapUs = gap, chunkWidthUs = 997L)
      .select("user_id", "event_id", "session_id")
    val plain = BehaviorOps.sessionize(df, gapUs = gap)
      .select("user_id", "event_id", "session_id")
    assert(chunked.except(plain).isEmpty && plain.except(chunked).isEmpty,
      s"sessionizeChunked diverges on negative ts: ${chunked.except(plain).take(5).mkString}")

    val probes = (0 until 2000).map(i => (i.toLong, "k", -3000L + i * 3)).toDF("probe_id", "k", "t")
    val refs = (0 until 120).map(i => ("k", -3100L + i * 53, i.toLong)).toDF("k", "t", "payload")
    val got = TemporalOps.asOfJoin(probes, refs, "k", "t", Seq("payload"))
      .select(col("probe_id"), col("asof_payload"))
    val chunkedAsof = TemporalOps
      .asOfJoinChunked(probes, refs, "k", "t", Seq("payload"), chunkWidth = 17L)
      .select(col("probe_id"), col("asof_payload"))
    assert(chunkedAsof.except(got).isEmpty && got.except(chunkedAsof).isEmpty,
      s"asOfJoinChunked diverges on negative ts: ${chunkedAsof.except(got).take(5).mkString}")
  }

  test("funnelAgg == funnel, hot key holding 90% of step events") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    // hot key: long interleaved step sequence incl. out-of-order noise;
    // cold keys cover missing-step and wrong-order corners
    val hot = (0 until 9000).map { i =>
      ("hot", steps((i * 7) % 3), (i * 11 % 2977).toLong * 3 + i % 3)
    }
    val cold = Seq(
      ("c_no_a", "b", 5L), ("c_no_a", "c", 9L),
      ("c_rev", "c", 1L), ("c_rev", "b", 2L), ("c_rev", "a", 3L),
      ("c_full", "a", 1L), ("c_full", "b", 2L), ("c_full", "c", 3L))
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(hot ++ cold), 16)
      .toDF("user_id", "event_type", "ts_us")
    val viaAgg = BehaviorOps.funnelAgg(df, steps)
    val viaList = BehaviorOps.funnel(df, steps)
    assert(viaAgg.count() == viaList.count())
    assert(viaAgg.except(viaList).isEmpty && viaList.except(viaAgg).isEmpty,
      s"funnelAgg diverges: ${viaAgg.except(viaList).take(5).mkString}")
  }

  test("asOfJoin: 90%-hot probe key matches the brute-force truth") {
    import spark.implicits._
    val hotProbes = (0 until 9000).map(i => (i.toLong, "hot", (i * 3).toLong))
    val coldProbes = (0 until 1000).map(i => (9000L + i, s"cold${i % 10}", (i * 5).toLong))
    val probes = (hotProbes ++ coldProbes).toDF("probe_id", "k", "t")
    // refs sparse: one per ~50 time units on the hot key, a few cold
    val refs = ((0 until 500).map(i => ("hot", (i * 53).toLong, i.toLong)) ++
      (0 until 10).flatMap(k => (0 until 5).map(i => (s"cold$k", (i * 700).toLong, 1000L + i))))
      .toDF("k", "t", "payload")

    val got = TemporalOps.asOfJoin(probes, refs, "k", "t", Seq("payload"))
      .select(col("probe_id"), col("asof_payload"))
    // brute-force truth: max-ts eligible ref per probe via plain join
    val truth = probes.as("p")
      .join(refs.as("r"), col("p.k") === col("r.k") && col("r.t") <= col("p.t"), "left")
      .groupBy(col("probe_id"))
      .agg(max_by(col("r.payload"), col("r.t")).as("asof_payload"))
    assert(got.count() == probes.count())
    assert(got.except(truth).isEmpty && truth.except(got).isEmpty,
      s"asOfJoin diverges from brute force: ${got.except(truth).take(5).mkString}")

    // the chunked variant must agree exactly, with chunks far narrower
    // than the ref spacing (forcing empty-ref chunks + carries) and with
    // an equal-ts in-chunk-ref tie at every chunkWidth multiple of 53
    val chunked = TemporalOps
      .asOfJoinChunked(probes, refs, "k", "t", Seq("payload"), chunkWidth = 17L)
      .select(col("probe_id"), col("asof_payload"))
    assert(chunked.except(got).isEmpty && got.except(chunked).isEmpty,
      s"asOfJoinChunked diverges: ${chunked.except(got).take(5).mkString}")
  }

  test("token-frequency join: one token in 95% of docs still profiles exactly") {
    // the corpus-frequency operators join exploded tokens back on the
    // token key — a stopword IS the hot key. Unlike window partitions,
    // this skewed shuffle JOIN is AQE-splittable; the test pins that the
    // result stays exact under the hot distribution.
    import spark.implicits._
    val docs = (0 until 2000).map { i =>
      val body = if (i % 20 == 0) s"rare$i word$i" else s"the the the word$i"
      (i.toLong, body)
    }.toDF("doc_id", "text")

    val got = TextOps.tokenCommonness(docs)
      .select("doc_id", "n_tokens", "min_freq", "sum_freq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val theFreq = 3L * 1900 // "the" appears 3x in each of the 1900 hot docs
    got.foreach { case (id, n, mn, sm) =>
      if (id % 20 == 0) { assert(n == 2 && mn == 1 && sm == 2) } // rareN + wordN, freq 1 each
      else { assert(n == 4 && mn == 1 && sm == 3 * theFreq + 1) }
    }

    // distinctiveTerms shares the skeleton: the hot token must never win
    // (df = 1900 puts it last), each doc's rank-1 term is its unique word
    val top = TextOps.distinctiveTerms(docs, perDoc = 1)
      .select("doc_id", "term").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(top.length == 2000)
    top.foreach { case (id, term) =>
      assert(term == (if (id % 20 == 0) s"rare$id" else s"word$id") || term == s"word$id",
        s"doc $id picked hot token '$term'")
    }
  }
}
