package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Embedding-level train/eval decontamination — the exact cross-product
  * definition vs the IVF cell-candidate scale arm. Oracle rows:
  * g_decontam_semantic + g_decontam_ivf (one shared hash =
  * the probe-all losslessness gate); q_stream_decontam (the stream-static
  * screen). This spec pins the arm relationships on a fixture small
  * enough to reason about by hand. */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // two train clusters on the axes, eval vectors at known angles
  private def emb: DataFrame = Seq(
    // train (label 1)
    (100L, Seq(1.0f, 0.0f, 0.0f), 1), (101L, Seq(0.95f, 0.05f, 0.0f), 1),
    (102L, Seq(0.0f, 1.0f, 0.0f), 1), (103L, Seq(0.0f, 0.9f, 0.1f), 1),
    // eval (label 0): near +x, near +y, far from both
    (1L, Seq(0.99f, 0.01f, 0.0f), 0), (2L, Seq(0.05f, 0.99f, 0.0f), 0),
    (3L, Seq(0.0f, 0.0f, 1.0f), 0))
    .toDF("vec_id", "embedding", "label")

  private val cents = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)))

  private def rows(df: DataFrame) = df
    .select("eval_id", "train_id", "sim", "contaminated")
    .as[(Long, Long, Double, Boolean)].collect().toSeq.sorted

  test("exact arm: per-eval argmax with threshold flag; far vector stays clean") {
    val got = rows(SimilarityOps.crossMaxCosine(emb, 0, 1, threshold = 0.9))
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 100L && byId(1L)._4, "eval 1 should flag against train 100")
    assert(byId(2L)._2 == 102L && byId(2L)._4, "eval 2 should flag against train 102")
    assert(!byId(3L)._4, "the orthogonal eval vector must stay clean")
  }

  test("probe-all IVF arm == exact arm row-for-row; reduced probes never fabricate") {
    val exact = rows(SimilarityOps.crossMaxCosine(emb, 0, 1, threshold = 0.9))
    val all = rows(SimilarityOps.crossMaxCosineIvf(emb, 0, 1, threshold = 0.9,
      centroids = cents, nProbe = 2))
    assert(all == exact, "probe-all must equal the cross-product definition")
    // one probe: each eval sees only its nearest cell's train vectors —
    // a SUBSET of candidates, so any returned argmax sim is <= exact
    val one = rows(SimilarityOps.crossMaxCosineIvf(emb, 0, 1, threshold = 0.9,
      centroids = cents, nProbe = 1))
    val exactById = exact.map(r => r._1 -> r._3).toMap
    one.foreach { r => assert(r._3 <= exactById(r._1)) }
    assert(one.map(_._1).toSet.subsetOf(exact.map(_._1).toSet))
  }
}
