package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.StreamingOps

/** In-engine logistic-regression training (full-batch GD, exact-integer
  * gradient sums): the descent actually learns (loss decreases, separable
  * classes separate), is bit-deterministic, and the streamed
  * feature-maintenance twin serves the identical descent. Oracle rows:
  * g_logit_train, q_stream_logit (shared truth — the unrolled-CTE SQL
  * replay). */
class LogitSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable toy corpus: "en" docs are stopword-dense
  private def toy: DataFrame = {
    val rnd = new scala.util.Random(61)
    (0L until 80L).map { i =>
      val en = i % 2 == 0
      val words =
        if (en) Seq.fill(12)(if (rnd.nextBoolean()) "the" else "of") :+ "data"
        else Seq.fill(12)(s"w${rnd.nextInt(20)}") :+ "data"
      (i, words.mkString(" "), if (en) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")))
  }

  private def loss(f: DataFrame, w: Seq[Long]): Double = {
    val xs = Seq("x0", "x1", "x2", "x3")
    val z = xs.zip(w).map { case (x, u) => lit(u) * lit(1e-8) * col(x) }
      .reduce(_ + _)
    // logistic loss: -y·ln σ - (1-y)·ln(1-σ)
    val sig = lit(1.0) / (lit(1.0) + exp(-z))
    f.agg(sum(-col("y") * log(sig) - (lit(1.0) - col("y")) * log(lit(1.0) - sig)))
      .head().getDouble(0)
  }

  test("descent reduces logistic loss and separates the separable classes") {
    val f = TextOps.logitFeatures(toy).localCheckpoint(true)
    val w0 = Seq.fill(4)(0L)
    val w = TextOps.logitTrain(f, steps = 8)
    assert(loss(f, w) < loss(f, w0),
      s"loss did not decrease: ${loss(f, w)} >= ${loss(f, w0)}")
    val scored = TextOps.logitScoreFeatures(f, w)
      .as[(Long, Double, Double)].collect().toSeq
    val pos = scored.filter(_._2 == 1.0).map(_._3)
    val neg = scored.filter(_._2 == 0.0).map(_._3)
    assert(pos.sum / pos.size > neg.sum / neg.size,
      "positives do not score above negatives after training")
  }

  test("the descent is bit-deterministic across runs and partitionings") {
    val f1 = TextOps.logitFeatures(toy)
    val f2 = TextOps.logitFeatures(toy.repartition(7))
    val w1 = TextOps.logitTrain(f1, steps = 3)
    val w2 = TextOps.logitTrain(f2, steps = 3)
    assert(w1 == w2, s"$w1 != $w2 — the gradient sum leaked accumulation order")
    assert(w1.exists(_ != 0L), "training moved no weight at all")
  }

  test("hashed-feature descent separates classes and is partition-deterministic") {
    val scored = TextOps.logitTrainHashed(toy, nBuckets = 64, steps = 6)
      .as[(Long, Double, Double)].collect().toSeq
    val pos = scored.filter(_._2 == 1.0).map(_._3)
    val neg = scored.filter(_._2 == 0.0).map(_._3)
    assert(pos.sum / pos.size > neg.sum / neg.size,
      "hashed model does not separate the separable classes")
    // bit-determinism across partitionings: the unit-sum activations and
    // exact-decimal gradients leak no accumulation order
    val again = TextOps.logitTrainHashed(toy.repartition(7), nBuckets = 64, steps = 6)
      .as[(Long, Double, Double)].collect().toSeq
    assert(scored.sorted == again.sorted)
  }

  test("streamed feature maintenance == batch train-and-score; drift refused") {
    val p = s"${tmpDir()}/lg"
    val half1 = toy.filter(col("doc_id") < 40)
    val half2 = toy.filter(col("doc_id") >= 40)
    StreamingOps.logitBatch(half1, 0L, p, 3, 4096.0, 1)
    StreamingOps.logitBatch(half2, 1L, p, 3, 4096.0, 1)
    val streamed = StreamingOps.readLogitScores(spark, p)
      .as[(Long, Double, Double)].collect().toSeq.sorted
    val batch = TextOps.logitTrainScore(toy, steps = 3)
      .as[(Long, Double, Double)].collect().toSeq.sorted
    assert(streamed == batch)
    // replay overwrites
    StreamingOps.logitBatch(half2, 1L, p, 3, 4096.0, 1)
    assert(StreamingOps.readLogitScores(spark, p)
      .as[(Long, Double, Double)].collect().toSeq.sorted == batch)
    // a drifted step count silently changes the whole descent — refuse
    val e = intercept[IllegalArgumentException] {
      StreamingOps.logitBatch(toy, 2L, p, 4, 4096.0, 1)
    }
    assert(e.getMessage.contains("schedule parameter mismatch"))
  }
}
