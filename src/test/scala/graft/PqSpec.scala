package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Product quantization (pqEncode / pqLut / pqTopK / ivfPqTopK /
  * trainPqCodebooks). The row-level oracle gates are g_sim_pq and
  * g_sim_ivfpq; these specs pin the engine-side invariants the oracle
  * can't see: partition invariance, the driver-reference equality of the
  * ADC arithmetic, probe-all losslessness, and trained-codebook
  * determinism/geometry.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4
  private val C = 3
  private val Dim = 8
  private val SubDim = Dim / M

  // deterministic, id-derived vectors — stable across partitionings
  private def vec(i: Long): Seq[Double] =
    (0 until Dim).map(j => (((i * 31 + j * 7) % 13) - 6) / 6.0 + 0.01 * (j + 1))

  private def vecsDf(n: Int) =
    (0L until n.toLong).map(i => (i, vec(i))).toDF("id", "v")

  private def codeword(s: Int, cid: Int): Seq[Double] =
    (0 until SubDim).map(j => if ((s * 17 + cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)

  private def codebooks: Seq[Seq[(Int, Seq[Double])]] =
    (0 until M).map(s => (1 to C).map(cid => (cid, codeword(s, cid))))

  // driver reference encode: same argmax (ties to the smallest code) and
  // the same sequential-fold cosine as the codegen kernel
  private def refCodes(x: Seq[Double]): Seq[Int] =
    (0 until M).map { s =>
      val xs = x.slice(s * SubDim, (s + 1) * SubDim)
      codebooks(s)
        .map { case (cid, w) => (cid, SimilarityOps.cosineOf(xs, w)) }
        .sortBy { case (cid, c) => (-c, cid) }
        .head._1
    }

  test("pqEncode matches the driver reference and is partition-invariant") {
    val df = vecsDf(40)
    def codesOf(parts: Int): Map[Long, Seq[Int]] =
      SimilarityOps.pqEncode(df.repartition(parts), codebooks)
        .select(col("id"), col("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val one = codesOf(1)
    assert(codesOf(7) == one, "codes must not depend on the partitioning")
    (0L until 40L).foreach { i =>
      assert(one(i) == refCodes(vec(i)), s"vector $i encodes differently")
    }
  }

  test("pqTopK equals the driver ADC reference, exact to the last long") {
    val q = vec(999)
    val lut = SimilarityOps.pqLut(codebooks, q)
    val got = SimilarityOps
      .pqTopK(SimilarityOps.pqEncode(vecsDf(40), codebooks), lut, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 40L)
      .map(i => (i, refCodes(vec(i)).zipWithIndex.map { case (c, s) => lut(s)(c - 1) }.sum))
      .sortBy { case (id, sc) => (-sc, id) }
    assert(got == want)
  }

  test("probe-all IVF-PQ == the full ADC scan (losslessness of the cell pruning)") {
    val q = vec(999)
    // coarse centroids: reuse the subspace-0 codewords widened to Dim
    val cents = (1 to C).map(cid =>
      (cid, (0 until Dim).map(j => if ((cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)))
    val full = SimilarityOps
      .pqTopK(SimilarityOps.pqEncode(vecsDf(40), codebooks),
        SimilarityOps.pqLut(codebooks, q), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val probeAll = SimilarityOps
      .ivfPqTopK(vecsDf(40), cents, codebooks, q, nProbe = C, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probeAll == full)
  }

  test("reduced-probe IVF-PQ returns a subset of its own probe cells' codes") {
    val q = vec(999)
    val cents = (1 to C).map(cid =>
      (cid, (0 until Dim).map(j => if ((cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)))
    val probes = SimilarityOps.probeCellsOf(cents, q, 1).toSet
    val inCells = SimilarityOps.assignCells(vecsDf(40), cents)
      .filter(col("cell").isin(probes.toSeq: _*))
      .select("id").as[Long].collect().toSet
    val got = SimilarityOps.ivfPqTopK(vecsDf(40), cents, codebooks, q, nProbe = 1, k = 10)
      .select("id").as[Long].collect().toSet
    assert(got.subsetOf(inCells), "pruned scan must only surface probe-cell members")
  }

  test("trainPqCodebooks: geometry, determinism, and codes stay in range") {
    val emb = vecsDf(60).select(col("id").as("vec_id"), col("v").as("embedding"))
    val t1 = SimilarityOps.trainPqCodebooks(emb, m = M, c = C, nIters = 2)
    val t2 = SimilarityOps.trainPqCodebooks(emb, m = M, c = C, nIters = 2)
    assert(t1 == t2, "training must be deterministic (hash seeds + fixed-point Lloyd)")
    assert(t1.size == M && t1.forall(cb => cb.size == C && cb.forall(_._2.size == SubDim)))
    val codes = SimilarityOps
      .pqEncode(vecsDf(60), t1)
      .select(explode(col("codes"))).as[Int].collect()
    assert(codes.forall(c => c >= 1 && c <= C))
  }

  test("persisted PQ index: codes-only files, directory pruning, probe-all == full scan") {
    val q = vec(999)
    val cents = (1 to C).map(cid =>
      (cid, (0 until Dim).map(j => if ((cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)))
    val emb = vecsDf(40).select(col("id").as("vec_id"), col("v").as("embedding"))
    val path = s"${tmpDir()}/pqidx"
    SimilarityOps.writePqIndex(emb, cents, codebooks, path)
    // the artifact holds codes, never vectors — the compression IS the file
    val schema = spark.read.parquet(path).schema.fieldNames.toSet
    assert(schema == Set("id", "codes", "cell"), s"unexpected columns: $schema")
    // probe-all over the persisted layout == the in-memory full ADC scan
    val full = SimilarityOps
      .pqTopK(SimilarityOps.pqEncode(vecsDf(40), codebooks),
        SimilarityOps.pqLut(codebooks, q), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val idx = SimilarityOps
      .pqTopKIndexed(spark, path, cents, codebooks, q, k = 10, nProbe = C)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(idx == full)
    // reduced probes: the scan carries a cell partition filter (directory
    // pruning), and only probe-cell files are touched
    val pruned = SimilarityOps.pqTopKIndexed(spark, path, cents, codebooks, q,
      k = 10, nProbe = 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no cell partition filter:\n$plan")
    val probed = SimilarityOps.probeCellsOf(cents, q, 1)
    val files = spark.read.parquet(path)
      .filter(col("cell").isin(probed: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(s"cell=${probed.head}")))
  }

  test("pqTopKIndexed refuses a probe whose geometry drifted from the index sidecar") {
    val cents = (1 to C).map(cid =>
      (cid, (0 until Dim).map(j => if ((cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)))
    val emb = vecsDf(10).select(col("id").as("vec_id"), col("v").as("embedding"))
    val path = s"${tmpDir()}/pqidx"
    SimilarityOps.writePqIndex(emb, cents, codebooks, path)
    // a 2-subspace probe against the 4-subspace index must fail loudly
    val drifted = (0 until M / 2).map(s => (1 to C).map(cid =>
      (cid, (0 until Dim / (M / 2)).map(j => if ((s + cid + j) % 2 == 0) 1.0 else -1.0))))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.pqTopKIndexed(spark, path, cents, drifted, vec(999), k = 5, nProbe = 1)
    }
    assert(e.getMessage.contains("geometry disagrees"))
  }

  test("pqEncode rejects ragged or non-consecutive codebooks") {
    val bad = codebooks.updated(0, Seq((2, codeword(0, 2)), (3, codeword(0, 3))))
    intercept[IllegalArgumentException] {
      SimilarityOps.pqEncode(vecsDf(5), bad)
    }
  }

  // ---- codes-only k-NN graph (knnGraphPq / ADC) ------------------------

  private def graphCentroids: Seq[(Int, Seq[Double])] =
    (1 to 3).map(c => (c, (0 until Dim).map(j =>
      if ((c * 11 + j * 5) % 3 == 0) 1.0 else -0.5)))

  private def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select(col("vec_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("knnGraphPq probe-all + full-refine == the exact knnGraph (ADC shortlist loses nothing)") {
    // with nProbe = |cells| every pair is a candidate and refine covering
    // the whole cell population makes the shortlist the full candidate
    // set, so the exact re-rank must reproduce the brute-force graph no
    // matter how badly the codebooks quantize — the losslessness contract
    // of the shortlist/re-rank plumbing itself
    val n = 40
    val df = vecsDf(n).withColumnRenamed("id", "vec_id")
    val exact = SimilarityOps.knnGraph(df, graphCentroids, k = 3, nProbe = 3,
      vecCol = "v")
    val viaPq = SimilarityOps.knnGraphPq(df, graphCentroids, codebooks, k = 3,
      nProbe = 3, refine = n, vecCol = "v")
    assert(edges(viaPq) == edges(exact), "probe-all/full-refine PQ graph must be exact")
  }

  test("knnGraphPq: querySample restricts queries only; partition-invariant") {
    val df = vecsDf(40).withColumnRenamed("id", "vec_id")
    val full = SimilarityOps.knnGraphPq(df, graphCentroids, codebooks, k = 3,
      nProbe = 2, refine = 4, vecCol = "v")
    val sampled = SimilarityOps.knnGraphPq(df, graphCentroids, codebooks, k = 3,
      nProbe = 2, refine = 4, vecCol = "v", querySample = id => id % 3 === 0)
    assert(edges(sampled) == edges(full.filter(col("vec_id") % 3 === 0)),
      "sampled graph must equal the full graph restricted to sampled queries")
    val repart = SimilarityOps.knnGraphPq(df.repartition(7), graphCentroids,
      codebooks, k = 3, nProbe = 2, refine = 4, vecCol = "v")
    assert(edges(repart) == edges(full), "graph must not depend on partitioning")
  }

  test("nnDescend: quality is monotone per iteration, partition-invariant, never loses a hit") {
    val df = vecsDf(40).withColumnRenamed("id", "vec_id")
    // descent can only escape the init's probed cells through OVERLAPPING
    // probe sets (an nProbe=1 init yields per-cell-closed subgraphs that
    // no amount of descent can bridge — a structural fact worth knowing):
    // 5 cells probed 2-at-a-time leaves real gaps AND real bridges
    val cents5 = (1 to 5).map(c => (c, (0 until Dim).map(j =>
      if ((c * 7 + j * 3) % 4 == 0) 1.0 else math.sin(c + j * 0.7))))
    val init = SimilarityOps.knnGraph(df, cents5, k = 3, nProbe = 2, vecCol = "v")
    def quality(g: org.apache.spark.sql.DataFrame): Double =
      g.agg(sum(col("sim"))).head().getDouble(0)
    def hitsVsExact(g: org.apache.spark.sql.DataFrame): Long = {
      val exact = SimilarityOps.knnGraph(df, cents5, k = 3, nProbe = 5, vecCol = "v")
      exact.select(col("vec_id"), col("neighbor_id"))
        .join(g.select(col("vec_id"), col("neighbor_id")),
          Seq("vec_id", "neighbor_id"), "left_semi").count()
    }
    // monotone: each additional round keeps old edges in the candidate
    // pool, so total kept similarity can only rise
    val qs = (0 to 3).map(i => quality(SimilarityOps.nnDescend(df, init, k = 3, nIters = i, vecCol = "v")))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a }, s"quality regressed: $qs")
    assert(qs.last > qs.head, "descent never improved on this fixture — fixture too easy?")
    assert(hitsVsExact(SimilarityOps.nnDescend(df, init, k = 3, nIters = 3, vecCol = "v"))
      >= hitsVsExact(init), "descent lost recall")
    // iters = 0 is the identity on (qid, id, sim)
    assert(edges(SimilarityOps.nnDescend(df, init, k = 3, nIters = 0, vecCol = "v")) == edges(init))
    // partition invariance
    val a = SimilarityOps.nnDescend(df, init, k = 3, nIters = 2, vecCol = "v")
    val b = SimilarityOps.nnDescend(df.repartition(7), init, k = 3, nIters = 2, vecCol = "v")
    assert(edges(a) == edges(b), "descent depends on partitioning")
    // shape: ranks are 1..k per query, no self-loops
    val rows = a.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-loop")
    assert(rows.groupBy(_.getLong(0)).values.forall(g =>
      g.map(_.getInt(3)).sorted.sameElements(1 to g.length)), "non-contiguous ranks")
  }

  test("nnDescendPq: full refine == nnDescend bit-equal; pruned refine monotone, never loses recall") {
    val df = vecsDf(40).withColumnRenamed("id", "vec_id")
    val cents5 = (1 to 5).map(c => (c, (0 until Dim).map(j =>
      if ((c * 7 + j * 3) % 4 == 0) 1.0 else math.sin(c + j * 0.7))))
    val init = SimilarityOps.knnGraph(df, cents5, k = 3, nProbe = 2, vecCol = "v")
    // k·refine = 36 = (2k)²: the ADC shortlist is EVERY proposal, so the
    // exact re-rank scores exactly what nnDescend scores — bit equality,
    // whatever the codebook quality (ADC only ordered a list that was
    // never cut)
    val full = SimilarityOps.nnDescendPq(df, init, codebooks, k = 3, nIters = 2,
      refine = 12, vecCol = "v")
    val exactDesc = SimilarityOps.nnDescend(df, init, k = 3, nIters = 2, vecCol = "v")
    assert(edges(full) == edges(exactDesc),
      "full-refine descent-on-codes must equal exact descent")
    // pruned refine: the merged graph still only keeps exact-scored
    // edges, old edges never leave the pool — recall vs the exact truth
    // can only rise from the init, and quality is monotone in iters
    def hitsVsExact(g: org.apache.spark.sql.DataFrame): Long = {
      val exact = SimilarityOps.knnGraph(df, cents5, k = 3, nProbe = 5, vecCol = "v")
      exact.select(col("vec_id"), col("neighbor_id"))
        .join(g.select(col("vec_id"), col("neighbor_id")),
          Seq("vec_id", "neighbor_id"), "left_semi").count()
    }
    val pruned = SimilarityOps.nnDescendPq(df, init, codebooks, k = 3, nIters = 2,
      refine = 2, vecCol = "v")
    assert(hitsVsExact(pruned) >= hitsVsExact(init), "pruned descent lost recall")
    // iters = 0 identity, partition invariance
    assert(edges(SimilarityOps.nnDescendPq(df, init, codebooks, k = 3, nIters = 0,
      refine = 2, vecCol = "v")) == edges(init))
    val b = SimilarityOps.nnDescendPq(df.repartition(7), init, codebooks, k = 3,
      nIters = 2, refine = 2, vecCol = "v")
    assert(edges(pruned) == edges(b), "descent-on-codes depends on partitioning")
  }

  test("knnGraphIncremental == full rebuild at every fixed probe setting (merge identity)") {
    // the incremental fold must be EXACT, not approximate: base edges
    // are top-k of the old candidates, old→new candidates are complete,
    // so the union's top-k equals the rebuilt graph's — at probe-all AND
    // at reduced probes (same frozen centroids)
    val df = vecsDf(50).withColumnRenamed("id", "vec_id")
    val old = df.filter(col("vec_id") % 3 =!= 0)
    val fresh = df.filter(col("vec_id") % 3 === 0)
    for (nProbe <- Seq(1, 2, 3)) {
      val base = SimilarityOps.knnGraph(old, graphCentroids, k = 3, nProbe = nProbe,
        vecCol = "v")
      val incr = SimilarityOps.knnGraphIncremental(base, old, fresh, graphCentroids,
        k = 3, nProbe = nProbe, vecCol = "v")
      val full = SimilarityOps.knnGraph(df, graphCentroids, k = 3, nProbe = nProbe,
        vecCol = "v")
      assert(edges(incr) == edges(full), s"nProbe=$nProbe: incremental diverged from rebuild")
    }
  }

  test("trainPqCodebooksJoint == trainPqCodebooks, bit for bit") {
    // the joint trainer's contract: one Lloyd loop over exploded
    // (subspace, subvector) rows must reproduce the m independent
    // trainers exactly — same subspace-blind seeds, same fixed-point
    // sums, same driver-side mean division
    val df = vecsDf(60).withColumnRenamed("id", "vec_id")
      .withColumnRenamed("v", "embedding")
    val perSub = SimilarityOps.trainPqCodebooks(df, m = M, c = C, nIters = 2)
    val joint = SimilarityOps.trainPqCodebooksJoint(df, m = M, c = C, nIters = 2)
    assert(joint == perSub, "joint trainer diverged from the per-subspace trainer")
  }

  test("pqNormTable is the flattened per-code squared reconstruction norm") {
    val got = SimilarityOps.pqNormTable(codebooks)
    val want = for { s <- 0 until M; (_, w) <- codebooks(s).sortBy(_._1) }
      yield math.floor(w.map(x => x * x).sum * 1e6).toLong
    assert(got == want)
  }
}
