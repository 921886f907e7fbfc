package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AssemblyOps

/** Loader-side assembly artifacts: the shard manifest's conservation /
  * range / checksum-sensitivity laws, and the span-corruption mask's
  * strata laws (bounds, non-overlap, density, per-sequence and per-seed
  * variation) against an independent Scala reference. Oracle rows:
  * g_shard_manifest, g_span_corrupt. */
class LoaderManifestSpec extends SparkSpec {
  import spark.implicits._

  private val L = 32L

  private def docs: DataFrame = {
    val rnd = new scala.util.Random(17)
    (0L until 60L).map(i => (i, Seq.fill(1 + rnd.nextInt(20))("w").mkString(" ")))
      .toDF("doc_id", "text")
  }

  private def manifest: DataFrame = AssemblyOps.packTokenSpans(docs, L)

  test("shardManifest: conservation, ranges, and shard assignment") {
    val m = manifest.cache()
    val shards = AssemblyOps.shardManifest(m, seqsPerShard = 4L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val slices = m.select("seq_id", "seq_pos", "doc_id", "len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // conservation: shard sums == manifest totals
    assert(shards.map(_._3).sum == slices.size.toLong)
    assert(shards.map(_._5).sum == slices.map(_._4).sum)
    assert(shards.map(_._2).sum == slices.map(_._1).distinct.size.toLong)
    // ranges: every shard's seq ids live in [shard*4, shard*4+4)
    shards.foreach { case (sh, _, _, _, _, first, last, _) =>
      assert(first >= sh * 4 && last < (sh + 1) * 4 && first <= last)
    }
    // every sequence is covered by exactly its shard
    assert(shards.map(r => (r._1, r._2)).toMap.values.sum ==
      slices.map(_._1).distinct.size.toLong)
  }

  test("shardManifest: checksum moves under any row perturbation") {
    val m = manifest.cache()
    def sums(df: DataFrame): Map[Long, Long] =
      AssemblyOps.shardManifest(df, 4L).select("shard", "checksum")
        .as[(Long, Long)].collect().toMap
    val base = sums(m)
    // changed value
    val bumped = sums(m.withColumn("len",
      when(col("seq_id") === 0 && col("seq_pos") === 0, col("len") + 1)
        .otherwise(col("len"))))
    assert(bumped(0L) != base(0L) && (bumped - 0L) == (base - 0L))
    // dropped row
    val dropped = sums(m.filter(!(col("seq_id") === 0 && col("seq_pos") === 0)))
    assert(dropped(0L) != base(0L))
    // duplicated row
    val dup = sums(m.unionByName(m.filter(col("seq_id") === 0 && col("seq_pos") === 0)))
    assert(dup(0L) != base(0L))
    // repartition leaves it alone (order-free sum)
    assert(sums(m.repartition(7)) == base)
  }

  test("spanCorruptMask: strata laws vs an independent reference") {
    val seqs = Seq(0L, 1L, 5L, 9L).toDF("seq_id")
    val got = AssemblyOps.spanCorruptMask(seqs, seqLen = 128L,
        densityPpm = 150000L, meanSpan = 3L)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // reference: 6 spans, 21-token strata, off = perm(seq*6+i) % 19
    val P = 2147483647L
    val ref = for (s <- Seq(0L, 1L, 5L, 9L); i <- 0L until 6L) yield {
      val off = ((s * 6 + i) % P * 62089911L) % P % 19L
      (s, i, i * 21 + off, 3L)
    }
    assert(got == ref.sorted)
    // bounds + non-overlap within each sequence
    got.groupBy(_._1).values.foreach { spans =>
      val sorted = spans.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._4 <= b._3)
        case _ =>
      }
      assert(sorted.head._3 >= 0 && sorted.last._3 + 3 <= 128)
    }
  }

  test("spanCorruptMask: seed and sequence variation, degenerate refusals") {
    val seqs = (0L until 40L).toDF("seq_id")
    def starts(seed: Long) =
      AssemblyOps.spanCorruptMask(seqs, 128L, 150000L, 3L, seed)
        .select("seq_id", "span_ix", "span_start")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val a = starts(0L)
    val b = starts(1L)
    assert(a != b) // seed re-places
    // offsets vary across sequences (not a constant schedule)
    assert(a.groupBy(_._2).values.exists(_.map(_._3).distinct.size > 1))
    // refusals: density too high / too low for even one span
    intercept[IllegalArgumentException] {
      AssemblyOps.spanCorruptMask(seqs, 128L, densityPpm = 600000L)
    }
    intercept[IllegalArgumentException] {
      AssemblyOps.spanCorruptMask(seqs, 128L, densityPpm = 1L)
    }
  }
}
