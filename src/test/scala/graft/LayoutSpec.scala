package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Z-order layout: the interleaved key, the written file layout, and the
  * pruning property it exists for — tight parquet min/max on BOTH
  * dimensions, audited from the actual file footers. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known small values)") {
    // a=0b11 at even positions -> 0b0101; b=0b11 at odd -> 0b1010
    val got = Seq((3L, 0L), (0L, 3L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 4))
      .as[Long].collect().toSeq
    // (5,2): a bits 101 -> z even bits 1,0,1 at pos 0,2,4 = 1+16 = 17;
    //        b bits 010 -> z odd bit at pos 3 = 8 -> 25
    assert(got == Seq(5L, 10L, 15L, 25L))
  }

  test("zValue is a bijection on the quantized grid (deinterleave round-trips)") {
    // every (a, b) in [0,32)^2 maps to a distinct key whose even/odd bits
    // deinterleave back to (a, b) — pins the shift/mask arithmetic
    val got = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), bits = 5).as("z"))
      .collect()
    assert(got.map(_.getLong(2)).distinct.length == 1024)
    got.foreach { r =>
      val z = r.getLong(2)
      def deinterleave(offset: Int): Long =
        (0 until 5).map(i => ((z >> (2 * i + offset)) & 1L) << i).sum
      assert(deinterleave(0) == r.getLong(0) && deinterleave(1) == r.getLong(1))
    }
  }

  // 64x64 grid, 16 files: each z-range file is a 16x16 tile of (a, b)
  // space, so a box filter on EITHER dimension prunes to its tile rows.
  private def grid() =
    (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")

  test("z-ordered layout prunes on the second dimension; linear layout cannot") {
    val dir = tmpDir()
    Layout.writeZOrdered(grid(), s"$dir/z", "a", "b", bits = 6, nFiles = 16)
    // the comparison layout: globally sorted on a alone (what a
    // single-dimension clustering gives you)
    grid().repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(s"$dir/linear")

    // filter box on b (the NON-leading dimension in the linear layout)
    val (zHits, zTotal) = Layout.candidateFiles(spark, s"$dir/z", "b", 8L, 15L)
    val (lHits, lTotal) = Layout.candidateFiles(spark, s"$dir/linear", "b", 8L, 15L)
    assert(zTotal == 16 && lTotal == 16)
    assert(lHits == 16)      // every a-sorted file spans all of b
    assert(zHits <= 6)       // only the tiles whose b-range overlaps [8,15]
    // and the z layout still prunes on the FIRST dimension too
    val (zHitsA, _) = Layout.candidateFiles(spark, s"$dir/z", "a", 0L, 7L)
    assert(zHitsA <= 6)
  }

  test("bucketed tables co-locate the join: no exchange in the plan") {
    // The other half of the layout story: two fact tables bucketed+sorted
    // on the join key join WITHOUT any shuffle — at 100 TB this turns the
    // recurring index-events join into a map-side zip of bucket files.
    val dir = tmpDir()
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ shape
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    try {
      (1 to 1000).map(i => (i.toLong, i * 2L)).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/ba").saveAsTable("graft_bucket_a")
      (1 to 1000).map(i => (i.toLong, i * 3L)).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/bb").saveAsTable("graft_bucket_b")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
      saved match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("z-ordered readback is lossless under a two-dimensional box filter") {
    val dir = tmpDir()
    Layout.writeZOrdered(grid(), s"$dir/z", "a", "b", bits = 6, nFiles = 16)
    val got = spark.read.parquet(s"$dir/z")
      .filter(col("a").between(10, 20) && col("b").between(30, 40))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (10 to 20).flatMap(a => (30 to 40).map(b => (a.toLong, b.toLong))).toSet
    assert(got == expected)
  }
}
