package graft

import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Mirrors the reference's only pure unit test —
  * PartitionCalculatorTests.GetNext_ShouldReturnNextDayPartition
  * (/root/reference/src/One.Inception.EventStore.Cassandra.Tests/
  * CassandraEventStoreSchemaTests.cs:5-19) — plus FileTime conversions. */
class TimeFnsSpec extends SparkSpec {

  // the reference's InlineData table, ported verbatim
  val partitionCases: Seq[(Int, Int)] = Seq(
    2024074 -> 2024075, // plain next day
    2023365 -> 2024001, // non-leap year wrap
    2024366 -> 2025001, // leap year wrap
    2024001 -> 2024002,
    2023364 -> 2023365,
  )

  test("nextPidOf matches the reference PartitionCalculator cases") {
    partitionCases.foreach { case (in, want) =>
      assert(TimeFns.nextPidOf(in) == want, s"pid $in")
    }
  }

  test("column nextPid matches the scala-side math") {
    import spark.implicits._
    val df = partitionCases.map(_._1).toDF("pid")
      .select(col("pid"), TimeFns.nextPid(col("pid")).as("next"))
    val got = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    partitionCases.foreach { case (in, want) => assert(got(in) == want) }
  }

  test("FileTime round-trips through micros") {
    import spark.implicits._
    val us = Seq(0L, 1L, 1704067798778549L, 4102444800000000L)
    val df = us.toDF("us").select(
      col("us"),
      TimeFns.fileTimeToMicros(TimeFns.microsToFileTime(col("us"))).as("rt"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("known FileTime epoch: 1970-01-01 -> 116444736000000000 ticks") {
    import spark.implicits._
    val ft = Seq(0L).toDF("us")
      .select(TimeFns.microsToFileTime(col("us"))).head.getLong(0)
    assert(ft == 116444736000000000L)
  }

  test("nanosToMicros floors like the oracle engine") {
    import spark.implicits._
    // 1.7e18 exceeds double mantissa — exactness matters
    val ns = Seq(1704067798778549829L, 999L, 1000L, 1001L)
    val got = ns.toDF("ns").select(TimeFns.nanosToMicros(col("ns")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1704067798778549L, 0L, 1L, 1L))
  }

  test("pid of a timestamp matches year*1000+dayOfYear") {
    import spark.implicits._
    val got = Seq("2024-01-01", "2024-12-31", "2023-12-31")
      .toDF("d")
      .select(TimeFns.pid(to_timestamp(col("d"))))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2024001, 2024366, 2023365))
  }

  test("utcMicros parses UTC date-times") {
    assert(TimeFns.utcMicros("1970-01-01T00:00:00") == 0L)
    assert(TimeFns.utcMicros("2024-01-10T00:00:00") == 1704844800000000L)
  }
}
