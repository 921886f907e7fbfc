package graft

import org.apache.spark.sql.functions._
import graft.functions.TimeFns
import graft.operators.{EventStoreOps, IndexOps}
import graft.sources.{Storage, Tables}

/** End-to-end store lifecycle on real testdata (sf0.001): land the event
  * log in the bucketed layout + derived index, then run the canonical
  * operators against the STORED tables — the full write->layout->query
  * path a deployment would use. */
class StoreRoundTripSpec extends SparkSpec {

  test("store then query: events + index round trip with pruning") {
    val dir = tmpDir()
    val log = Tables.eventLog(spark, "/root/testdata/sf0.001")
      .withColumn("id", col("id").cast("string").cast("binary")) // binary ids as stored

    // land the log and the derived index
    Storage.appendEvents(log.drop("et"), s"$dir/events", nBuckets = 8)
    Storage.appendIndex(IndexOps.buildIndex(log), s"$dir/index_by_eventtype")

    // per-aggregate pruned read equals the pre-storage view
    val agg7 = Storage.readAggregate(spark, s"$dir/events", "7".getBytes, nBuckets = 8)
    val expected = log.filter(col("id") === lit("7".getBytes)).count()
    assert(agg7.count() == expected && expected > 0)

    // index read prunes on (et, pid) partition columns
    val idx = spark.read.parquet(s"$dir/index_by_eventtype")
    val purchases = idx.filter(col("et") === "purchase" && col("pid") === 2024005)
    val plan = purchases.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("et") && plan.contains("pid"))
    assert(purchases.count() > 0)

    // index-driven replay (C1) against the stored tables matches a direct
    // filter of the log
    val ftLo = TimeFns.FileTimeEpochTicks
    val ftHi = Long.MaxValue / 2
    val viaIndex = EventStoreOps.indexJoin(
      Storage.readEvents(spark, s"$dir/events"),
      IndexOps.readRange(idx, "purchase", ftLo, ftHi))
    val direct = log.filter(col("et") === "purchase")
    assert(viaIndex.count() == direct.count())
  }

  test("sf0.1 scale: 100k rows land bucketed and pruned reads stay exact") {
    val dir = tmpDir()
    val log = Tables.eventLog(spark, "/root/testdata/sf0.1")
      .withColumn("id", col("id").cast("string").cast("binary"))
    Storage.appendEvents(log.drop("et"), s"$dir/events", nBuckets = 32)
    val stored = Storage.readEvents(spark, s"$dir/events")
    assert(stored.count() == 100000L)
    // a thousand aggregates spread over 32 buckets; spot-check several
    Seq("7", "42", "1234").foreach { idStr =>
      val expected = log.filter(col("id") === lit(idStr.getBytes)).count()
      val got = Storage.readAggregate(spark, s"$dir/events", idStr.getBytes, nBuckets = 32)
      assert(got.count() == expected, s"aggregate $idStr")
      // clustering order within the aggregate
      val revs = got.select("rev").collect().map(_.getInt(0))
      assert(revs.sameElements(revs.sorted), s"order for $idStr")
    }
  }

  test("compaction reduces file count and preserves data + pruned reads") {
    val dir = tmpDir()
    import spark.implicits._
    val mk = (revs: Seq[Int]) => revs.toDF("rev")
      .withColumn("id", lit("c-agg".getBytes))
      .withColumn("pos", lit(0))
      .withColumn("ts", lit(1L))
      .withColumn("data", lit("d".getBytes))
      .select("id", "rev", "pos", "ts", "data")
    // many small appends -> many files
    (1 to 5).foreach(i => Storage.appendEvents(mk(Seq(i)), s"$dir/events", nBuckets = 2))
    def fileCount(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }
    val before = fileCount(s"$dir/events")
    assert(before >= 5)
    Storage.compact(spark, s"$dir/events", s"$dir/events_c")
    val after = fileCount(s"$dir/events_c")
    assert(after < before)
    val back = Storage.readAggregate(spark, s"$dir/events_c", "c-agg".getBytes, nBuckets = 2)
    assert(back.collect().map(_.getAs[Int]("rev")).toSeq == Seq(1, 2, 3, 4, 5))
  }
}
