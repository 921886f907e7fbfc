package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AssemblyOps, CurationOps}

/** Training-run assembly: concat-and-chunk packing against a sequential
  * Scala reference, the two-phase/naive bit-equality, tiling and
  * doc-continuity invariants, epoch expansion vs the allocation report,
  * and the composed manifest's conservation laws. */
class AssemblySpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  private def perm(id: Long, seed: Long): Long = ((id % P) * 62089911L + seed) % P

  /** Sequential reference packer over (id, n) in given order. */
  private def refPack(docs: Seq[(Long, Long)], L: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val total = docs.map(_._2).sum
    val nFull = total / L
    var off = 0L
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    docs.foreach { case (id, n) =>
      if (n > 0) {
        ((off / L) to ((off + n - 1) / L)).foreach { s =>
          if (s < nFull) {
            val a = math.max(off, s * L)
            val e = math.min(off + n, (s + 1) * L)
            out += ((s, a - s * L, id, a - off, e - a))
          }
        }
        off += n
      }
    }
    out.result()
  }

  private def randomCounts(n: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    // include zero-token docs and docs far longer than a sequence
    (0L until n.toLong).map(i => i -> (rnd.nextInt(40) match {
      case 0 => 0L
      case 1 => 300L + rnd.nextInt(200)
      case k => k.toLong
    }))
  }

  private def packRows(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("seq_id", "seq_pos", "doc_id", "doc_start", "len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("packTokenSpans == sequential reference (counts col, zero/huge docs)") {
    val docs = randomCounts(200, seed = 11)
    val df = docs.toDF("doc_id", "n_tokens").repartition(7)
    val got = packRows(AssemblyOps.packTokenSpans(
      df, seqLen = 64L, nTokensCol = Some("n_tokens"), chunkSize = 16L))
    assert(got == refPack(docs, 64L).toSet)
  }

  test("packTokenSpans two-phase (small chunks) == single-chunk naive, bit-equal") {
    val docs = randomCounts(150, seed = 23)
    val df = docs.toDF("doc_id", "n_tokens")
    val fine = packRows(AssemblyOps.packTokenSpans(
      df, seqLen = 50L, nTokensCol = Some("n_tokens"), chunkSize = 3L))
    val naive = packRows(AssemblyOps.packTokenSpans(
      df, seqLen = 50L, nTokensCol = Some("n_tokens"), chunkSize = Long.MaxValue))
    assert(fine == naive)
  }

  test("packTokenSpans: sequences tile [0, L) and count = T div L") {
    val docs = randomCounts(300, seed = 5)
    val spans = AssemblyOps.packTokenSpans(
        docs.toDF("doc_id", "n_tokens"), seqLen = 32L,
        nTokensCol = Some("n_tokens"), chunkSize = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val total = docs.map(_._2).sum
    val bySeq = spans.groupBy(_._1)
    assert(bySeq.keySet == (0L until total / 32L).toSet)
    bySeq.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // contiguous tiling: each slice starts where the previous ended
      assert(sorted.scanLeft(0L)((acc, r) => acc + r._3).init.toSeq ==
        sorted.map(_._2).toSeq)
      assert(rows.map(_._3).sum == 32L)
    }
  }

  test("packTokenSpans: per-doc slices are a contiguous token prefix") {
    val docs = randomCounts(120, seed = 41)
    val spans = AssemblyOps.packTokenSpans(
        docs.toDF("doc_id", "n_tokens"), seqLen = 48L,
        nTokensCol = Some("n_tokens"), chunkSize = 32L)
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(3), r.getLong(4)))
    val counts = docs.toMap
    spans.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      // slices tile [0, covered) in seq order; covered <= n, and only the
      // corpus-tail doc(s) may be cut short
      var expect = 0L
      sorted.foreach { r => assert(r._3 == expect, s"doc $id gap"); expect += r._4 }
      assert(expect <= counts(id))
    }
  }

  test("packTokenSpans over text: tokenized equivalently to split-on-space") {
    val df = Seq(
      (0L, "a b c d e"), (1L, "f g"), (2L, null.asInstanceOf[String]),
      (3L, "h i j k l m n o p q"), (4L, "r")
    ).toDF("doc_id", "text")
    val got = packRows(AssemblyOps.packTokenSpans(df, seqLen = 4L))
    // null text -> "" -> split gives [""] -> 1 token (engine convention)
    val counts = Seq(0L -> 5L, 1L -> 2L, 2L -> 1L, 3L -> 10L, 4L -> 1L)
    assert(got == refPack(counts, 4L).toSet)
  }

  test("epochExpand matches the allocation report: full repeats + minimal frac prefix") {
    val docs = AssemblyFixture.documents(spark)
    val alloc = CurationOps.unimaxAllocation(docs, budgetTokens = 40000L, epochCap = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val rows = AssemblyOps.epochExpand(docs, budgetTokens = 40000L, epochCap = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val meta = docs.select(col("doc_id"), col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nTok = meta.map(m => m._1 -> m._3).toMap
    val bySource = meta.groupBy(_._2)
    rows.groupBy(_._2).foreach { case (src, instances) =>
      val (srcTok, allocTok) = alloc(src)
      val full = if (srcTok > 0) allocTok / srcTok else 0L
      val frac = if (srcTok > 0) allocTok % srcTok else 0L
      val srcIds = bySource(src).map(_._1).toSet
      // every doc of the source appears in epochs 0..full-1 exactly once each
      val byEpoch = instances.groupBy(_._3)
      (0L until full).foreach { ep =>
        assert(byEpoch(ep).map(_._1).toSet == srcIds, s"source $src epoch $ep")
      }
      // the fractional epoch is the minimal sk-order prefix covering frac
      val fracIds = byEpoch.getOrElse(full, Array.empty[(Long, String, Long, Long)])
        .map(_._1).toSet
      val ordered = srcIds.toSeq.sortBy(id => (perm(id, 0L), id))
      var cum = 0L
      val expect = ordered.takeWhile { id => val before = cum; cum += nTok(id); before < frac }
      assert(fracIds == expect.toSet, s"source $src frac prefix")
      assert(byEpoch.keySet.forall(_ <= full))
    }
  }

  test("epochExpand is repartition-invariant and carries exact token counts") {
    val docs = AssemblyFixture.documents(spark)
    def run(d: DataFrame) =
      AssemblyOps.epochExpand(d, budgetTokens = 40000L, epochCap = 3, nRanges = 5)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("trainManifest conserves the expanded stream: kept tokens = (T div L) * L") {
    val docs = AssemblyFixture.documents(spark)
    val expanded = AssemblyOps.epochExpand(docs, budgetTokens = 40000L, epochCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val total = expanded.map(_._3).sum
    val manifest = AssemblyOps.trainManifest(docs,
        budgetTokens = 40000L, epochCap = 3, seqLen = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6)))
    assert(manifest.map(_._5).sum == (total / 128L) * 128L)
    assert(manifest.map(_._1).distinct.length == (total / 128L).toInt)
    // every (doc, epoch) instance appears, sliced to at most its token
    // count; instances absent entirely must fit inside the dropped tail
    val perInstance = manifest.groupBy(m => (m._3, m._4)).map { case (k, v) => k -> v.map(_._5).sum }
    val counts = expanded.map(t => (t._1, t._2) -> t._3).toMap
    perInstance.foreach { case (k, tok) => assert(tok <= counts(k)) }
    val absentTokens = counts.view.filterKeys(k => !perInstance.contains(k)).values.sum
    assert(absentTokens <= total % 128L, "a non-tail instance vanished from the manifest")
  }

  test("seeds genuinely re-permute (pre-shift, not the order-preserving after-shift)") {
    val docs = AssemblyFixture.documents(spark)
    // epochExpand: a different seed picks a different fractional prefix
    // (budget 1000 << the fixture's ~6.5k capped tokens, so every source
    // has a nonzero fractional remainder for the seed to choose)
    def fracIds(seed: Long) =
      AssemblyOps.epochExpand(docs, budgetTokens = 1000L, epochCap = 3, seed = seed)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val f0 = fracIds(0L)
    val f9 = fracIds(9L)
    assert(f0 != f9, "epochExpand fractional prefix ignored the seed")
    // trainManifest: a different seed interleaves differently, and the
    // same seed's interleave differs from the expansion's own order
    def manifest(seed: Long) =
      AssemblyOps.trainManifest(docs, budgetTokens = 40000L, epochCap = 3,
          seqLen = 64L, seed = seed)
        .select("seq_id", "seq_pos", "doc_id", "epoch")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(manifest(0L) != manifest(9L), "trainManifest interleave ignored the seed")
  }

  test("trainManifest interleave: one doc's epochs do not pack adjacently by construction") {
    // the permutation at seed+1 over eid must scatter a doc's repeats:
    // with 3+ epochs per doc in a small corpus, at least one doc's
    // consecutive epochs land in different sequences
    val docs = AssemblyFixture.documents(spark)
    val m = AssemblyOps.trainManifest(docs, budgetTokens = 40000L, epochCap = 3, seqLen = 64L)
      .select("doc_id", "epoch", "seq_id").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val firstSeq = m.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val scattered = firstSeq.groupBy(_._1._1).values.exists { eps =>
      eps.size >= 2 && eps.map(_._2).toSet.size >= 2
    }
    assert(scattered, "epoch repeats all packed adjacently — interleave broken")
  }
}

/** Small deterministic documents fixture shared by assembly tests. */
object AssemblyFixture {
  def documents(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val words = Vector("lorem", "ipsum", "dolor", "sit", "amet", "sed", "qui", "nam")
    (0L until 120L).map { i =>
      val n = 3 + rnd.nextInt(30)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "), s"src${i % 7}")
    }.toDF("doc_id", "text", "source")
  }
}
