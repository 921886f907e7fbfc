package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.plans.MaxSimColumns

/** The retrieval-serving rerankers: MaxSim late interaction
  * ([[SimilarityOps.maxSimTopK]]) and MMR diversification
  * ([[SimilarityOps.mmrSelect]]).
  *
  * Both score in exact fixed-point integers, so each spec checks against
  * an independently-computed Scala reference with the same integer math —
  * any divergence (ordering, tie-break, penalty term) is a hard failure,
  * not a tolerance judgement. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def floorPpm(cos: Double): Long = math.floor(cos * 1e6).toLong

  private def cosOf(a: Seq[Double], b: Seq[Double]): Double = {
    val n = math.min(a.size, b.size)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // deterministic pseudo-random corpus (no Random: seeds via a hash mix)
  private def vecOf(id: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => math.sin(id * 37.0 + j * 11.0) + 0.3 * math.cos(id * 13.0 - j))

  private def corpus(n: Int, dim: Int): DataFrame =
    (0 until n).map(i => (i.toLong, vecOf(i, dim))).toDF("vec_id", "embedding")

  // --- MaxSim ---

  test("maxSim: a doc holding a permutation of the query tokens scores T * 1e6") {
    val dim = 8; val subDim = 2 // 4 tokens
    val q = Seq(1.0, 0.0, 0.0, 1.0, -1.0, 0.0, 0.5, 0.5)
    val qTok = MaxSimColumns.tokensOf(q, subDim)
    val permuted = qTok.reverse.flatten // same bag, different positions
    val e = Seq((0L, q), (1L, permuted), (2L, q.map(-_)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.maxSimTopK(e, q, subDim, k = 3)
      .as[(Long, Long)].collect().toMap
    // every query token finds an exact match in both the self doc and the
    // permuted bag — identical scores (late interaction ignores position),
    // within one floor ulp of T * 1e6 per token (cos(x,x) can land at
    // 0.999... in floats; the kernel must NOT paper over that, the oracle
    // replays the same arithmetic)
    def ref(doc: Seq[Double]): Long = {
      val dTok = MaxSimColumns.tokensOf(doc, subDim)
      qTok.map(qt => dTok.map(dt => floorPpm(cosOf(qt, dt))).max).sum
    }
    assert(got(0L) == ref(q), "self-match diverged from reference")
    assert(got(1L) == got(0L), "permuted bag must score the same as the self doc")
    assert(got(0L) >= 4L * 999999L && got(0L) <= 4L * 1000000L)
    // the negated doc still scores well — ITS BAG contains (-1)*each token,
    // and a query token like (-1, 0) finds the negation of (1, 0) as an
    // exact match: late interaction matches tokens, not whole documents.
    // The reference equality is the real assertion.
    assert(got(2L) == ref(q.map(-_)), "negated doc diverged from reference")
    assert(got(2L) < got(0L), "negated doc must still rank below the self doc")
  }

  test("maxSim kernel == Scala reference on a random corpus (exact integers)") {
    val dim = 16; val subDim = 4
    val e = corpus(20, dim)
    val q = vecOf(100, dim)
    val qTok = MaxSimColumns.tokensOf(q, subDim)
    val got = SimilarityOps.maxSimTopK(e, q, subDim, k = 20)
      .as[(Long, Long)].collect().toMap
    (0 until 20).foreach { i =>
      val dTok = MaxSimColumns.tokensOf(vecOf(i, dim), subDim)
      val expected = qTok.map(qt => dTok.map(dt => floorPpm(cosOf(qt, dt))).max).sum
      assert(got(i.toLong) == expected, s"maxsim diverges on doc $i")
    }
  }

  test("maxSim: single-token geometry (subDim = dim) degrades to the floored cosine") {
    val dim = 6
    val e = corpus(12, dim)
    val q = vecOf(50, dim)
    val got = SimilarityOps.maxSimTopK(e, q, subDim = dim, k = 12)
      .as[(Long, Long)].collect().toMap
    (0 until 12).foreach { i =>
      assert(got(i.toLong) == floorPpm(cosOf(q, vecOf(i, dim))),
        s"one-token maxsim must equal floor(cos * 1e6) on doc $i")
    }
  }

  // --- MMR ---

  /** Reference greedy MMR with the operator's exact integer math. */
  private def refMmr(
      vecs: Map[Long, Seq[Double]], q: Seq[Double], k: Int, poolSize: Int,
      lambdaNum: Long, lambdaDen: Long): Seq[(Long, Int, Long)] = {
    val rel = vecs.map { case (id, v) => id -> floorPpm(cosOf(v, q)) }
    val pool = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(poolSize).map(_._1)
    val mu = lambdaDen - lambdaNum
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to k).foreach { i =>
      val scored = pool.filterNot(selected.contains).map { c =>
        val penalty =
          if (selected.isEmpty) 0L
          else selected.map(s => floorPpm(cosOf(vecs(c), vecs(s)))).max
        val mmr = if (selected.isEmpty) lambdaNum * rel(c)
                  else lambdaNum * rel(c) - mu * penalty
        (c, mmr)
      }
      val (best, score) = scored.minBy { case (id, m) => (-m, id) }
      picks += ((best, i, score))
      selected += best
    }
    picks.toSeq
  }

  test("mmrSelect == reference greedy on a random corpus") {
    val dim = 8
    val n = 30
    val e = corpus(n, dim)
    val q = vecOf(200, dim)
    val vecs = (0 until n).map(i => i.toLong -> vecOf(i, dim)).toMap
    val got = SimilarityOps.mmrSelect(e, q, k = 5, poolSize = 20)
      .as[(Long, Int, Long)].collect().toSeq
    val expected = refMmr(vecs, q, k = 5, poolSize = 20, 7L, 10L)
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("mmrSelect with lambda = 1 is relevance-only: picks = top-k of the pool") {
    val dim = 8
    val n = 25
    val e = corpus(n, dim)
    val q = vecOf(300, dim)
    val vecs = (0 until n).map(i => i.toLong -> vecOf(i, dim)).toMap
    val topByRel = vecs.toSeq
      .map { case (id, v) => (id, floorPpm(cosOf(v, q))) }
      .sortBy { case (id, r) => (-r, id) }.take(4).map(_._1)
    val got = SimilarityOps.mmrSelect(e, q, k = 4, poolSize = 10,
      lambdaNum = 1, lambdaDen = 1).as[(Long, Int, Long)].collect()
    assert(got.map(_._1).toSeq == topByRel)
    assert(got.map(_._2).toSeq == (1 to 4))
  }

  test("mmrSelect diversifies: a duplicate of pick 1 is passed over for a distinct doc") {
    // three docs: two exact copies aligned with the query, one slightly
    // less relevant but distinct. Relevance-only would pick the two copies
    // first; MMR at lambda = 0.25 must pick the distinct doc second (the
    // copy's penalty is a full 1e6; note lambda = 0.5 would TIE here —
    // when pick 1 equals the query, rel(c) == sim(c, pick1) for every c,
    // so rel - sim is 0 across the pool: the penalty weight must exceed
    // the relevance weight to diversify against a query-aligned pick).
    val q = Seq(1.0, 0.0)
    val e = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.8, 0.6)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrSelect(e, q, k = 2, poolSize = 3,
      lambdaNum = 1, lambdaDen = 4).as[(Long, Int, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 3L), s"expected diversification, got ${got.toSeq}")
  }

  test("mmrSelectFromPool: the pool seam reproduces mmrSelect given the same pool") {
    val dim = 8
    val e = corpus(30, dim)
    val q = vecOf(200, dim)
    val whole = SimilarityOps.mmrSelect(e, q, k = 5, poolSize = 20)
      .as[(Long, Int, Long)].collect().toSeq
    // rebuild the identical pool by hand and feed it through the seam
    val qc = q.map(x => lit(x))
    val rel = floor(graft.plans.GraftFunctions.cosine($"v", array(qc: _*)) * lit(1e6))
      .cast("long")
    val pool = e.select($"vec_id".as("id"),
        graft.functions.VectorFns.toDouble($"embedding").as("v"))
      .withColumn("rel_ppm", rel)
      .orderBy($"rel_ppm".desc, $"id").limit(20)
    val viaSeam = SimilarityOps.mmrSelectFromPool(pool, k = 5)
      .as[(Long, Int, Long)].collect().toSeq
    assert(viaSeam == whole)
  }

  test("mmrSelect: picks are distinct with contiguous pick numbers") {
    val e = corpus(15, 8)
    val got = SimilarityOps.mmrSelect(e, vecOf(7, 8), k = 6, poolSize = 15)
      .as[(Long, Int, Long)].collect()
    assert(got.map(_._1).distinct.length == 6)
    assert(got.map(_._2).toSeq == (1 to 6))
  }
}
