package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.plans.ScalarQuant

/** The compressed-scan rungs below PQ: SQ8 ([[SimilarityOps.sq8TopK]])
  * and the binary sign sketch ([[SimilarityOps.hammingTopK]]).
  *
  * Contracts pinned here:
  *  - encode semantics == [[SimilarityOps.quantizeStats]] (one definition
  *    of int8 quantization in the repo, kernel == aggregate formulation);
  *  - covering refine ⇒ bit-equal to [[SimilarityOps.bruteForceTopK]]
  *    (the compressed scan is a candidate GENERATOR; with every row in
  *    the shortlist the exact re-rank IS brute force);
  *  - sign-pack bit layout incl. bit 63 (the wrap point a long's sign
  *    bit would silently corrupt if packing used arithmetic adds);
  *  - zero-norm rows never crash or emit NaN rows from either scan;
  *  - driver-side twins (query-vector encode/pack) == the row kernels.
  */
class QuantScanSpec extends SparkSpec {
  import spark.implicits._

  private val N = 24
  private def ring: DataFrame =
    (0 until N).map { i =>
      val th = 2.0 * math.Pi * i / N
      (i.toLong, Seq(math.cos(th), math.sin(th)))
    }.toDF("vec_id", "embedding")

  private def queryOf(e: DataFrame, id: Long): Seq[Double] =
    e.filter($"vec_id" === id).select($"embedding").as[Seq[Double]].head()

  test("sq8Encode == quantizeStats semantics (kernel vs aggregate formulation)") {
    val e = ring.unionByName(Seq((100L, Seq(0.0, 0.0))).toDF("vec_id", "embedding"))
    val fromCodes = SimilarityOps.sq8Encode(e)
      .select($"id".as("vec_id"),
        aggregate($"codes", lit(127L), (acc, x) => least(acc, x.cast("long"))).as("q_min"),
        aggregate($"codes", lit(-127L), (acc, x) => greatest(acc, x.cast("long"))).as("q_max"),
        aggregate($"codes", lit(0L), (acc, x) => acc + abs(x.cast("long"))).as("q_l1"))
    val stats = SimilarityOps.quantizeStats(e)
    assert(fromCodes.exceptAll(stats).isEmpty && stats.exceptAll(fromCodes).isEmpty)
  }

  test("driver-side twins == row kernels (query and corpus quantize identically)") {
    val rows = SimilarityOps.sq8Encode(ring)
      .select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val packs = ring.select($"vec_id",
        graft.plans.GraftFunctions.signPack64($"embedding"))
      .as[(Long, Seq[Long])].collect().toMap
    (0 until N).foreach { i =>
      val v = queryOf(ring, i.toLong)
      assert(ScalarQuant.encodeInt8(v).toSeq == rows(i.toLong).map(_.toLong),
        s"encodeInt8 twin diverges at row $i")
      assert(ScalarQuant.signPack(v).toSeq == packs(i.toLong),
        s"signPack twin diverges at row $i")
    }
  }

  test("signPack bit layout: indices map to bits, dim 64 sets bit 63 without corruption") {
    // dims 0, 5, 63 positive, everything else negative/zero
    val v = (0 until 64).map(i => if (i == 0 || i == 5 || i == 63) 1.0 else -1.0)
    val packed = ScalarQuant.signPack(v)
    assert(packed.length == 1)
    assert(packed(0) == ((1L << 0) | (1L << 5) | (1L << 63)))
    // 65 dims spill into a second word
    val v2 = v :+ 1.0
    val p2 = ScalarQuant.signPack(v2)
    assert(p2.length == 2 && p2(0) == packed(0) && p2(1) == 1L)
    // exact zero is NOT positive (strict >): no bit
    assert(ScalarQuant.signPack(Seq(0.0, 1.0)).head == 2L)
  }

  test("sq8TopK: covering refine == bruteForceTopK bit-equal") {
    val e = ring
    val q = queryOf(e, 0L)
    val exact = SimilarityOps.bruteForceTopK(e, q, 5)
    val got = SimilarityOps.sq8TopK(e, q, k = 5, refine = N).drop("q_dot")
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
  }

  test("hammingTopK: covering refine == bruteForceTopK bit-equal") {
    val e = ring
    val q = queryOf(e, 3L)
    val exact = SimilarityOps.bruteForceTopK(e, q, 5)
    val got = SimilarityOps.hammingTopK(e, q, k = 5, refine = N).drop("hamming")
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
  }

  test("ivfSq8TopK: probe-all == sq8TopK (cell routing is lossless at full probes)") {
    val e = ring
    val q = queryOf(e, 0L)
    val cents = Seq((1, Seq(1.0, 0.0)), (2, Seq(-1.0, 0.0)))
    val all = SimilarityOps.ivfSq8TopK(e, cents, q, nProbe = 2, k = 5, refine = N)
    val brute = SimilarityOps.sq8TopK(e, q, k = 5, refine = N)
    assert(all.exceptAll(brute).isEmpty && brute.exceptAll(all).isEmpty)
    // nProbe = 1 prunes to the +x cell: every answered id sits on the +x
    // half of the ring (the -x half is in the unprobed cell)
    val pruned = SimilarityOps.ivfSq8TopK(e, cents, q, nProbe = 1, k = N, refine = N)
    val ids = pruned.select($"vec_id").as[Long].collect().toSet
    assert(ids.nonEmpty && ids.forall(i => math.cos(2 * math.Pi * i / N) > -1e-9),
      s"unprobed-cell member answered: $ids")
  }

  test("pruned refine still returns k exact-scored rows, ranked by true cosine") {
    val e = ring
    val q = queryOf(e, 0L)
    Seq(
      SimilarityOps.sq8TopK(e, q, k = 4, refine = 2).drop("q_dot"),
      SimilarityOps.hammingTopK(e, q, k = 4, refine = 2).drop("hamming")
    ).foreach { df =>
      val sims = df.select($"sim").as[Double].collect()
      assert(sims.length == 4)
      assert(sims.sameElements(sims.sorted.reverse), "not ranked by exact sim")
      // the exact scores are true floored cosines (ring: all in [-1, 1])
      assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    }
  }

  test("zero-norm rows are dropped at the re-rank, never NaN in the answer") {
    val e = ring.unionByName(Seq((100L, Seq(0.0, 0.0))).toDF("vec_id", "embedding"))
    val q = queryOf(ring, 0L)
    // covering refine: the zero row WOULD be in any covering shortlist if
    // not excluded — sq8 pins its quantized cosine below -1; hamming drops
    // it at the norm guard
    val s = SimilarityOps.sq8TopK(e, q, k = N, refine = N + 1)
    val h = SimilarityOps.hammingTopK(e, q, k = N, refine = N + 1)
    Seq(s, h).foreach { df =>
      val rows = df.collect()
      assert(rows.forall(_.getLong(0) != 100L), "zero-norm row surfaced")
      assert(rows.forall(r => !r.getDouble(2).isNaN), "NaN sim surfaced")
    }
  }

  test("sq8 integer outputs: q_dot is the exact quantized dot (long, engine-stable)") {
    val e = ring
    val q = queryOf(e, 0L)
    val qc = ScalarQuant.encodeInt8(q)
    val codes = SimilarityOps.sq8Encode(e)
      .select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
    SimilarityOps.sq8TopK(e, q, k = 5, refine = 3).collect().foreach { r =>
      val id = r.getLong(0)
      val expected = codes(id).zip(qc).map { case (c, qq) => c.toLong * qq }.sum
      assert(r.getLong(1) == expected, s"q_dot mismatch for $id")
    }
  }
}
