package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** [[SimilarityOps.graphSearch]] — beam search over a persisted k-NN
  * graph: the exhaustive identity (entry = corpus reproduces brute
  * force), hop monotonicity (the visited set only grows), self-exclusion,
  * and ring navigability (a far entry walks to the true neighbor through
  * graph edges alone). */
class GraphSearchSpec extends SparkSpec {
  import spark.implicits._

  // n points on the unit circle: cosine similarity is monotone in angular
  // distance, so the k=2 graph is exactly the ring's adjacency — the
  // cleanest navigable structure a beam walk must traverse.
  private val N = 16
  private def ring: DataFrame =
    (0 until N).map { i =>
      val th = 2.0 * math.Pi * i / N
      (i.toLong, Seq(math.cos(th), math.sin(th)))
    }.toDF("vec_id", "embedding")

  // one centroid ⇒ one cell ⇒ nProbe=1 is probe-all: knnGraph == brute force
  private val oneCell = Seq((1, Seq(1.0, 0.0)))

  test("exhaustive identity: entry = corpus, nHops = 0 reproduces brute force") {
    val e = ring
    val expected = SimilarityOps.knnGraph(e, oneCell, k = 3, nProbe = 1)
    val got = SimilarityOps.graphSearch(
      graphEdges = expected.limit(0), // edges unused at nHops = 0
      embeddings = e, probes = e, entry = e.select("vec_id"),
      k = 3, beam = N, nHops = 0, excludeSelf = true, probeIdCol = "vec_id")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("hop monotonicity: per-rank sims never degrade as the hop budget grows") {
    val e = ring
    val graph = SimilarityOps.knnGraph(e, oneCell, k = 2, nProbe = 1)
    val entry = e.filter($"vec_id" === 0).select("vec_id")
    def run(h: Int) = SimilarityOps.graphSearch(graph, e, e, entry,
      k = 3, beam = 4, nHops = h, excludeSelf = true, probeIdCol = "vec_id")
    val s1 = run(1).select($"vec_id", $"rank", $"sim".as("sim1"))
    val s3 = run(3).select($"vec_id", $"rank", $"sim".as("sim3"))
    val degraded = s1.join(s3, Seq("vec_id", "rank")).filter($"sim3" < $"sim1")
    assert(degraded.isEmpty)
    // and the deeper walk visits at least as much: row counts can only grow
    assert(run(3).count() >= run(1).count())
  }

  test("ring navigability: a far entry reaches each query's true neighbor") {
    val e = ring
    val graph = SimilarityOps.knnGraph(e, oneCell, k = 2, nProbe = 1)
    val entry = e.filter($"vec_id" === 0).select("vec_id")
    val got = SimilarityOps.graphSearch(graph, e, e, entry,
        k = 1, beam = 4, nHops = 8, excludeSelf = true, probeIdCol = "vec_id")
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    (0 until N).foreach { i =>
      val expected = math.min((i + N - 1) % N, (i + 1) % N) // tie -> smaller id
      assert(got(i.toLong) == expected.toLong,
        s"query $i: got ${got(i.toLong)}, want $expected")
    }
  }

  test("excludeSelf: member probes would otherwise answer with themselves") {
    val e = ring
    val entry = e.select("vec_id")
    val withSelf = SimilarityOps.graphSearch(
      e.limit(0).select($"vec_id", $"vec_id".as("neighbor_id")),
      e, e, entry, k = 1, beam = N, nHops = 0, probeIdCol = "vec_id")
    assert(withSelf.filter($"neighbor_id" === $"vec_id" && $"sim" === 1.0)
      .count() == N)
    val noSelf = SimilarityOps.graphSearch(
      e.limit(0).select($"vec_id", $"vec_id".as("neighbor_id")),
      e, e, entry, k = 1, beam = N, nHops = 0, excludeSelf = true,
      probeIdCol = "vec_id")
    assert(noSelf.filter($"neighbor_id" === $"vec_id").isEmpty)
  }

  test("cellMedoids: one deterministic seed per cell, the own-centroid argmax") {
    val e = ring
    // two centroids on the +x / -x axes: each cell's medoid is the ring
    // point most aligned with its centroid — id 0 for +x; for -x the
    // antipode i = N/2 (cos = 1 exactly)
    val cents = Seq((1, Seq(1.0, 0.0)), (2, Seq(-1.0, 0.0)))
    val m = SimilarityOps.cellMedoids(e, cents)
      .select($"cell", $"vec_id").as[(Int, Long)].collect().toMap
    assert(m == Map(1 -> 0L, 2 -> (N / 2).toLong))
    // and medoid seeds serve as well as a hand-picked entry on the ring
    val graph = SimilarityOps.knnGraph(e, oneCell, k = 2, nProbe = 1)
    val viaMedoids = SimilarityOps.graphSearch(graph, e, e,
      SimilarityOps.cellMedoids(e, cents).select("vec_id"),
      k = 1, beam = 4, nHops = 8, excludeSelf = true, probeIdCol = "vec_id")
    val viaFixed = SimilarityOps.graphSearch(graph, e, e,
      e.filter($"vec_id" === 0 || $"vec_id" === N / 2).select("vec_id"),
      k = 1, beam = 4, nHops = 8, excludeSelf = true, probeIdCol = "vec_id")
    assert(viaMedoids.exceptAll(viaFixed).isEmpty && viaFixed.exceptAll(viaMedoids).isEmpty)
  }

  test("serving over the streamed, compacted graph == serving over the batch graph") {
    import graft.streaming.StreamingOps
    val e = ring
    val path = s"${tmpDir()}/g"
    // land the corpus in two micro-batches, compact, read the resolved
    // asset — the maintained graph IS what a serving deployment walks
    val cents = Seq((1, Seq(1.0, 0.0)), (2, Seq(-1.0, 0.0)))
    StreamingOps.knnGraphBatch(e.filter($"vec_id" < 10), 0L, cents, 2, 2, path)
    StreamingOps.knnGraphBatch(e.filter($"vec_id" >= 10), 1L, cents, 2, 2, path)
    StreamingOps.compactKnnGraph(spark, path)
    val streamed = StreamingOps.readKnnGraph(spark, path)
    val batch = SimilarityOps.knnGraph(e, cents, k = 2, nProbe = 2)
    val entry = e.filter($"vec_id" === 0).select("vec_id")
    def serve(g: org.apache.spark.sql.DataFrame) =
      SimilarityOps.graphSearch(g, e, e, entry, k = 3, beam = 4, nHops = 6,
        excludeSelf = true, probeIdCol = "vec_id")
    val a = serve(streamed); val b = serve(batch)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("graphSearchPq: covering beam + refine == graphSearch bit-equal, any codebooks") {
    val e = ring
    val graph = SimilarityOps.knnGraph(e, oneCell, k = 2, nProbe = 1)
    val entry = e.filter($"vec_id" === 0).select("vec_id")
    // deliberately crude codebooks (±1 signs, m=2 over dim 2): with
    // beam >= |reachable| the beam cut can drop nothing (visited sets
    // coincide with the exact walk's), and k*refine >= |visited| makes
    // the exact re-rank score everything — codebook quality is irrelevant
    val crude = (0 until 2).map(s => (1 to 2).map(cid =>
      (cid, Seq(if ((s + cid) % 2 == 0) 1.0 else -1.0))))
    val exact = SimilarityOps.graphSearch(graph, e, e, entry,
      k = 3, beam = N, nHops = 4, excludeSelf = true, probeIdCol = "vec_id")
    val viaCodes = SimilarityOps.graphSearchPq(graph, e, e, entry, crude,
      k = 3, beam = N, nHops = 4, refine = N, excludeSelf = true,
      probeIdCol = "vec_id")
    assert(viaCodes.exceptAll(exact).isEmpty && exact.exceptAll(viaCodes).isEmpty)
    // pruned beam/refine: answers are still exact-cosine-scored rows with
    // contiguous ranks and no self-matches
    val pruned = SimilarityOps.graphSearchPq(graph, e, e, entry, crude,
      k = 2, beam = 4, nHops = 8, refine = 2, excludeSelf = true,
      probeIdCol = "vec_id")
    val rows = pruned.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-loop")
    assert(rows.groupBy(_.getLong(0)).values.forall(g =>
      g.map(_.getInt(3)).sorted.sameElements(1 to g.length)), "non-contiguous ranks")
  }

  test("empty entry set degrades to an empty answer; beam < k is rejected") {
    val e = ring
    val graph = SimilarityOps.knnGraph(e, oneCell, k = 2, nProbe = 1)
    val none = SimilarityOps.graphSearch(graph, e, e, e.limit(0).select("vec_id"),
      k = 1, beam = 4, nHops = 2, excludeSelf = true, probeIdCol = "vec_id")
    assert(none.isEmpty)
    intercept[IllegalArgumentException] {
      SimilarityOps.graphSearch(graph, e, e, e.select("vec_id"),
        k = 5, beam = 3, nHops = 1, probeIdCol = "vec_id")
    }
  }
}
