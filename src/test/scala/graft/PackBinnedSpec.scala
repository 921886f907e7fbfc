package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AssemblyOps

/** Truncation-free length-binned packing + the packing-efficiency
  * report: two-phase rank == single-window rank, bin/slot tiling laws,
  * dense sequence ids, membership (overlength/empty excluded, everything
  * else exactly once), repartition/seed invariances, and packStats'
  * exact-integer laws on both packers' manifests. Oracle rows:
  * g_pack_binned, g_pack_stats. */
class PackBinnedSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16L

  /** Deterministic corpus: lengths 1..24 (some > L). Note the tokenizer
    * convention: `split("", " ")` = `[""]`, so an empty doc counts 1
    * token in BOTH engines — the fixture stays ≥ 1 token; the empty-
    * CORPUS degenerate is its own test. */
  private def fixture: Map[Long, Int] = {
    val rnd = new scala.util.Random(41)
    (0L until 81L).map(i => i -> (1 + rnd.nextInt(24))).toMap
  }

  private def docs: DataFrame =
    fixture.toSeq.sortBy(_._1)
      .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")

  private def collectPack(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("seq_id", "seq_pos", "doc_id", "len")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  test("two-phase chunked rank == single-window rank (bit-equal)") {
    // chunkSize 3 forces many permutation-key chunks per length group;
    // chunkSize P collapses to one chunk = the naive single window
    val many = collectPack(AssemblyOps.packBinned(docs, L, chunkSize = 3L))
    val one = collectPack(AssemblyOps.packBinned(docs, L, chunkSize = AssemblyOps.P))
    assert(many == one)
  }

  test("membership, slot tiling, capacity, and dense sequence ids") {
    val rows = collectPack(AssemblyOps.packBinned(docs, L))
    val expected = fixture.filter { case (_, n) => n > 0 && n <= L }
    // every eligible doc exactly once, with its own length; nothing else
    assert(rows.map(_._3).sorted == expected.keys.toSeq.sorted)
    rows.foreach { case (_, _, id, len) => assert(len == expected(id).toLong) }
    val bySeq = rows.groupBy(_._1)
    bySeq.foreach { case (_, slices) =>
      val len = slices.head._4
      assert(slices.forall(_._4 == len)) // one length group per sequence
      // slots tile 0, len, 2len, ... with no gaps
      assert(slices.map(_._2).sorted == (0L until slices.size.toLong).map(_ * len))
      assert(slices.size * len <= L) // never overflows the sequence
    }
    // per length group: every sequence full (cap docs) except at most the last
    bySeq.values.groupBy(_.head._4).foreach { case (len, seqs) =>
      val cap = L / len
      assert(seqs.count(_.size.toLong != cap) <= 1)
      assert(seqs.forall(_.size.toLong <= cap))
    }
    // dense ids: 0 .. n_seqs-1 with no holes
    val ids = bySeq.keys.toSeq.sorted
    assert(ids == (0L until ids.size.toLong))
  }

  test("repartition invariance and seed re-placement") {
    val base = collectPack(AssemblyOps.packBinned(docs, L))
    val re = collectPack(AssemblyOps.packBinned(docs.repartition(7), L))
    assert(re == base)
    val seeded = collectPack(AssemblyOps.packBinned(docs, L, seed = 5L))
    assert(seeded != base) // placement moves ...
    assert(seeded.map(_._3).sorted == base.map(_._3).sorted) // ... membership doesn't
  }

  test("packStats: exact laws on the binned manifest") {
    val stats = AssemblyOps.packStats(AssemblyOps.packBinned(docs, L), docs, L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (nSeqs, nSlices, packed, split, dropped, kept, droppedToks, fill, splitPpm) = stats
    val eligible = fixture.filter { case (_, n) => n > 0 && n <= L }
    val over = fixture.filter { case (_, n) => n > L }
    assert(packed == eligible.size.toLong && nSlices == eligible.size.toLong)
    assert(split == 0L && splitPpm == 0L) // never splits by construction
    assert(dropped == over.size.toLong)
    assert(kept == eligible.values.map(_.toLong).sum)
    assert(droppedToks == over.values.map(_.toLong).sum)
    assert(fill == kept * 1000000L / (nSeqs * L))
    assert(fill < 1000000L) // slack exists in this fixture
  }

  test("packStats: exact laws on the concat-and-chunk manifest") {
    val stats = AssemblyOps.packStats(AssemblyOps.packTokenSpans(docs, L), docs, L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (nSeqs, nSlices, packed, split, dropped, kept, droppedToks, fill, splitPpm) = stats
    val total = fixture.values.map(_.toLong).sum
    assert(kept == (total / L) * L) // the dropped tail is the only loss
    assert(nSeqs == total / L)
    assert(fill == 1000000L) // full by construction
    assert(droppedToks == total % L)
    val manifest = AssemblyOps.packTokenSpans(docs, L)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(split == manifest.valuesIterator.count(_ > 1).toLong)
    assert(splitPpm == split * 1000000L / packed)
    assert(nSlices == manifest.values.sum)
    assert(dropped == fixture.count { case (_, n) => n > 0 }.toLong - packed)
  }

  test("empty corpus: zero rows, zero-guarded report") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(AssemblyOps.packBinned(empty, L).count() == 0)
    val stats = AssemblyOps.packStats(AssemblyOps.packBinned(empty, L), empty, L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(stats == ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }
}
