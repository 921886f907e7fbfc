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

  private def loss(f: DataFrame, w: Seq[Long],
      xs: Seq[String] = TextOps.LogitXCols): Double = {
    val z = xs.zip(w).map { case (x, u) => lit(u) * lit(1e-8) * col(x) }
      .reduce(_ + _)
    // logistic loss: -y·ln σ - (1-y)·ln(1-σ)
    val sig = lit(1.0) / (lit(1.0) + exp(-z))
    f.agg(sum(-col("y") * log(sig) - (lit(1.0) - col("y")) * log(lit(1.0) - sig)))
      .head().getDouble(0)
  }

  test("descent reduces logistic loss and separates the separable classes") {
    val f = TextOps.logitFeatures(toy).localCheckpoint(true)
    val w0 = Seq.fill(TextOps.LogitXCols.size)(0L)
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

  test("the qualityRules features widen the model: punctuation-separable corpus") {
    // classes share stopword hits (0), TTR and token counts; punctuation
    // ratio / mean token length are the real signal — the r14 4-feature
    // template (bias, stopword, TTR, length) can barely learn this
    // corpus, the promoted qualityRules features separate it
    val docs2 = (0L until 60L).map { i =>
      val en = i % 2 == 0
      val words = Seq.tabulate(10)(j => s"tok${(i + j) % 5}")
      val text = if (en) words.mkString(" ") else words.map(_ + "!!").mkString(" ")
      (i, text, if (en) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")))
    val f = TextOps.logitFeatures(docs2).localCheckpoint(true)
    val old4 = TextOps.LogitXCols.take(4)
    val wOld = TextOps.logitTrain(f, xCols = old4, steps = 8)
    val wNew = TextOps.logitTrain(f, steps = 8)
    assert(loss(f, wNew) < loss(f, wOld, old4),
      s"richer features did not reduce loss: ${loss(f, wNew)} >= ${loss(f, wOld, old4)}")
  }

  test("Poisson GLM: NLL decreases; descent is partition-deterministic") {
    def feats(d: DataFrame) = TextOps.logitFeatures(d,
      label = size(split(col("text"), " ")).cast("double") / lit(1000.0))
    val f = feats(toy).localCheckpoint(true)
    def nll(w: Seq[Long]): Double = {
      val z = TextOps.LogitXCols.zip(w)
        .map { case (x, u) => lit(u) * lit(1e-8) * col(x) }.reduce(_ + _)
      f.agg(sum(exp(z) - col("y") * z)).head().getDouble(0)
    }
    val w = TextOps.glmTrainLog(f, steps = 6)
    assert(nll(w) < nll(Seq.fill(TextOps.LogitXCols.size)(0L)),
      "Poisson descent did not reduce the NLL")
    assert(w.exists(_ != 0L), "training moved no weight at all")
    val w2 = TextOps.glmTrainLog(feats(toy.repartition(7)), steps = 6)
    assert(w == w2, s"$w != $w2 — the gradient sum leaked accumulation order")
  }

  test("compaction folds feature deltas; fractional lrDen pins by exact bits") {
    val p = s"${tmpDir()}/lgc"
    // a FRACTIONAL lrDen: the r14 toLong pin collapsed 4096.5 and 4096.9
    // to the same recorded value, letting a drifted restart silently
    // retrain a different descent
    StreamingOps.logitBatch(toy.filter(col("doc_id") < 40), 0L, p, 3, 4096.5, 1)
    StreamingOps.logitBatch(toy.filter(col("doc_id") >= 40), 1L, p, 3, 4096.5, 1)
    StreamingOps.compactLogitState(spark, p)
    def dirs(sub: String) = new java.io.File(s"$p/$sub").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs("_docs") == Seq("__batch=-1", "__batch=1"))
    val batchTruth = TextOps.logitTrainScore(toy, steps = 3, lrDen = 4096.5)
      .as[(Long, Double, Double)].collect().toSeq.sorted
    def servedNow = StreamingOps.readLogitScores(spark, p)
      .as[(Long, Double, Double)].collect().toSeq.sorted
    assert(servedNow == batchTruth)
    StreamingOps.vacuumScheduleManifests(spark, p)
    assert(dirs("manifest") == Seq("__batch=1"))
    // a refresh over the folded layout recomputes identically
    StreamingOps.logitBatch(toy.filter(col("doc_id") >= 40), 1L, p, 3, 4096.5, 1)
    assert(servedNow == batchTruth)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.logitBatch(toy, 2L, p, 3, 4096.9, 1)
    }
    assert(e.getMessage.contains("schedule parameter mismatch"))
  }

  test("streamed GLM == batch; a logit sink refuses a GLM restart (link pin)") {
    val p = s"${tmpDir()}/glm"
    StreamingOps.glmBatch(toy.filter(col("doc_id") < 40), 0L, p, 3, 4096.0, 1)
    StreamingOps.glmBatch(toy.filter(col("doc_id") >= 40), 1L, p, 3, 4096.0, 1)
    def feats(d: DataFrame) = TextOps.logitFeatures(d,
      label = size(split(col("text"), " ")).cast("double") / lit(1000.0))
    val f = feats(toy).localCheckpoint(true)
    val batch = TextOps.logitScoreFeatures(f, TextOps.glmTrainLog(f, steps = 3))
      .as[(Long, Double, Double)].collect().toSeq.sorted
    assert(StreamingOps.readGlmScores(spark, p)
      .as[(Long, Double, Double)].collect().toSeq.sorted == batch)
    // the link id is pinned: the logit trainer must refuse this sink
    val e = intercept[IllegalArgumentException] {
      StreamingOps.logitBatch(toy, 2L, p, 3, 4096.0, 1)
    }
    assert(e.getMessage.contains("schedule parameter mismatch"))
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

  test("an empty doc yields finite features (x4/x6 guard) and a finite descent") {
    val d = toy.limit(10).select(col("doc_id"), col("lang"),
        when(col("doc_id") === 0L, lit("")).otherwise(col("text")).as("text"))
      .withColumn("n_chars", length(col("text")))
    val f = TextOps.logitFeatures(d)
    val row = f.filter(col("doc_id") === 0L)
      .select(TextOps.LogitXCols.map(col): _*).head()
    // length("") = 0: the unguarded ratios were 0/0 (NULL/NaN); the
    // greatest(..,1) denominators pin both to an exact 0.0
    assert(row.getDouble(4) == 0.0 && row.getDouble(6) == 0.0)
    TextOps.LogitXCols.indices.foreach { i =>
      assert(!row.isNullAt(i) && !row.getDouble(i).isNaN, s"x$i not finite")
    }
    // and the poisoned-gradient failure mode is gone: weights stay finite
    val w = TextOps.logitTrain(f, steps = 2)
    assert(w.forall(u => math.abs(u) < Long.MaxValue / 2))
    assert(loss(f, w) < loss(f, Seq.fill(TextOps.LogitXCols.size)(0L)))
  }

  test("streamed DoReMi == batch doremiWeights; retention works; eta drift refused") {
    import graft.operators.CurationOps
    val p = s"${tmpDir()}/dm"
    val d = toy.withColumn("source", col("lang"))
    StreamingOps.doremiBatch(d.filter(col("doc_id") < 40), 0L, p, 3, 4096.0, 1.0, 1)
    StreamingOps.doremiBatch(d.filter(col("doc_id") >= 40), 1L, p, 3, 4096.0, 1.0, 1)
    val streamed = StreamingOps.readDoremiWeights(spark, p)
      .as[(String, Double, Double)].collect().toSeq.sorted
    val scored = TextOps.logitTrainScore(d, steps = 3)
    val batch = CurationOps.doremiWeights(
        TextOps.logitLossPerDoc(scored)
          .join(d.select(col("doc_id"), col("source")), Seq("doc_id")),
        eta = 1.0, steps = 3)
      .as[(String, Double, Double)].collect().toSeq.sorted
    assert(streamed == batch)
    assert(streamed.map(_._3).sum > 0.99) // weights are a distribution
    // retention from day one: compaction + vacuum leave serving unchanged
    StreamingOps.compactDoremiState(spark, p)
    StreamingOps.vacuumScheduleManifests(spark, p)
    def versions = new java.io.File(s"$p/manifest").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(versions == Seq("__batch=1"))
    assert(StreamingOps.readDoremiWeights(spark, p)
      .as[(String, Double, Double)].collect().toSeq.sorted == batch)
    // a drifted EG rate silently changes the mixture — refuse, named
    val e = intercept[IllegalArgumentException] {
      StreamingOps.doremiBatch(d, 2L, p, 3, 4096.0, 2.0, 1)
    }
    assert(e.getMessage.contains("schedule parameter mismatch"))
  }

  test("streamed BT reward selection == batch; retention works; keepFrac drift refused") {
    import graft.operators.CurationOps
    val p = s"${tmpDir()}/bt"
    val d = toy.withColumn("source", col("lang"))
    StreamingOps.btRankBatch(d.filter(col("doc_id") < 40), 0L, p,
      3, 4096.0, 0.25, 4, 1)
    StreamingOps.btRankBatch(d.filter(col("doc_id") >= 40), 1L, p,
      3, 4096.0, 0.25, 4, 1)
    val streamed = StreamingOps.readBtRank(spark, p)
      .as[(Long, String, Double, Int)].collect().toSeq.sorted
    // the batch truth — the SAME shared operator the refresh calls, fed
    // from raw docs instead of landed evidence (what this test pins is
    // the evidence landing + latest-wins resolve + refresh plumbing)
    val batch = CurationOps.btRewardRank(
        TextOps.logitFeatures(d)
          .select(col("doc_id") +: TextOps.LogitXCols.map(col): _*)
          .join(d.select(col("doc_id"), col("source"),
            floor(graft.functions.TextFns.qualityScore(col("text")) * lit(1e4))
              .cast("long").as("score")), Seq("doc_id")),
        steps = 3)
      .as[(Long, String, Double, Int)].collect().toSeq.sorted
    assert(streamed == batch && streamed.nonEmpty)
    // retention from day one: compaction + vacuum leave serving unchanged
    StreamingOps.compactBtState(spark, p)
    StreamingOps.vacuumScheduleManifests(spark, p)
    assert(StreamingOps.readBtRank(spark, p)
      .as[(Long, String, Double, Int)].collect().toSeq.sorted == batch)
    // a drifted keep fraction silently changes the selection — refuse
    val e = intercept[IllegalArgumentException] {
      StreamingOps.btRankBatch(d, 2L, p, 3, 4096.0, 0.5, 4, 1)
    }
    assert(e.getMessage.contains("schedule parameter mismatch"))
  }

  test("Bradley-Terry fit on preference diffs: pairwise accuracy beats the coin") {
    import graft.operators.{Checkpoints, CurationOps}
    // pairs from the quality ranking; chosen docs are stopword-dense "en"
    // docs with higher quality scores in this toy, so the diff features
    // are separably signed and the BT descent should rank chosen > rejected
    val d = toy
    val pairs = CurationOps.preferencePairs(
      d.select(col("doc_id"), col("lang").as("source"),
        floor(graft.functions.TextFns.qualityScore(col("text")) * lit(1e4))
          .cast("long").as("score")))
    assert(pairs.count() > 0)
    val feats = TextOps.logitFeatures(d)
      .select(col("doc_id") +: TextOps.LogitXCols.map(col): _*)
    val diffs = Checkpoints.pin(
      pairs
        .join(feats.select(col("doc_id").as("chosen_id") +:
          TextOps.LogitXCols.map(c => col(c).as(s"c_$c")): _*), Seq("chosen_id"))
        .join(feats.select(col("doc_id").as("rejected_id") +:
          TextOps.LogitXCols.map(c => col(c).as(s"r_$c")): _*), Seq("rejected_id"))
        .select(col("chosen_id").as("doc_id") +: lit(1.0).as("y") +:
          TextOps.LogitXCols.map(c => (col(s"c_$c") - col(s"r_$c")).as(c)): _*),
      reliable = false)
    val w = TextOps.logitTrain(diffs, steps = 3)
    // the bias diff is identically 0, so its weight never moves
    assert(w.head == 0L)
    val scored = TextOps.logitScoreFeatures(diffs, w)
    val acc = scored.agg(
      (sum(when(col("logit") >= 0.0, 1.0).otherwise(0.0)) / count(lit(1))))
      .head().getDouble(0)
    assert(acc > 0.5, s"pairwise accuracy $acc should beat a coin")
  }

  test("BT reward ranking: diff-trained weights order chosen above rejected on full docs") {
    import graft.operators.{Checkpoints, CurationOps}
    val d = toy
    val pairs = CurationOps.preferencePairs(
      d.select(col("doc_id"), col("lang").as("source"),
        floor(graft.functions.TextFns.qualityScore(col("text")) * lit(1e4))
          .cast("long").as("score")))
    val feats = Checkpoints.pin(TextOps.logitFeatures(d)
      .select(col("doc_id") +: TextOps.LogitXCols.map(col): _*), reliable = false)
    val diffs =
      pairs
        .join(feats.select(col("doc_id").as("chosen_id") +:
          TextOps.LogitXCols.map(c => col(c).as(s"c_$c")): _*), Seq("chosen_id"))
        .join(feats.select(col("doc_id").as("rejected_id") +:
          TextOps.LogitXCols.map(c => col(c).as(s"r_$c")): _*), Seq("rejected_id"))
        .select(col("chosen_id").as("doc_id") +: lit(1.0).as("y") +:
          TextOps.LogitXCols.map(c => (col(s"c_$c") - col(s"r_$c")).as(c)): _*)
    val w = TextOps.logitTrain(diffs, steps = 3)
    // score EVERY doc with the pairwise-trained reward (the g_bt_rank path):
    // the reward of a chosen doc should beat its rejected counterpart for
    // most pairs — scoring full docs must be consistent with the diff fit
    // (z is linear, so reward(c) - reward(r) = logit(diff) up to flooring)
    val rewards = TextOps.logitScoreFeatures(feats.withColumn("y", lit(1.0)), w)
      .select(col("doc_id"), col("logit").as("reward"))
    val frac = pairs
      .join(rewards.select(col("doc_id").as("chosen_id"), col("reward").as("cr")),
        Seq("chosen_id"))
      .join(rewards.select(col("doc_id").as("rejected_id"), col("reward").as("rr")),
        Seq("rejected_id"))
      .agg((sum(when(col("cr") > col("rr"), 1.0).otherwise(0.0)) / count(lit(1))))
      .head().getDouble(0)
    assert(frac > 0.5, s"reward ordered $frac of pairs correctly; expected > 0.5")
    // and the per-source top-quarter keep is exact: quota rows per source
    val kept = CurationOps.scoreQuantileFilter(
      rewards.join(d.select(col("doc_id"), col("lang").as("source")), Seq("doc_id")),
      keepFrac = 0.25, saltBuckets = 4, scoreCol = "reward")
    val counts = kept.groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    val expected = d.groupBy(col("lang")).count().as[(String, Long)].collect()
      .map { case (l, n) => l -> math.ceil(0.25 * n).toLong }.toMap
    assert(counts == expected)
  }

  test("zipfFit: a single-token-type language degenerates to slope 0, not NaN") {
    val d = Seq(
      (0L, "aaa aaa aaa aaa", "zz"), // one distinct type -> OLS denom 0
      (1L, "the of the of data word list more", "en"),
      (2L, "the the of data word fact item other", "en"))
      .toDF("doc_id", "text", "lang")
    val rows = TextOps.zipfFit(d, topN = 100)
      .orderBy(col("lang")).collect()
    val zz = rows.find(_.getString(0) == "zz").get
    assert(zz.getLong(1) == 1L)
    assert(zz.getDouble(2) == 0.0) // slope: horizontal line
    assert(zz.getDouble(3) == math.floor(math.log(4.0) * 1e6) / 1e6) // intercept = ln(freq)
    val en = rows.find(_.getString(0) == "en").get
    assert(!en.getDouble(2).isNaN && en.getDouble(2) < 0.0) // natural text slopes down
  }
}
