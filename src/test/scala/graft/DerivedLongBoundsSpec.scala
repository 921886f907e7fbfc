package graft

import org.apache.spark.sql.functions._
import graft.functions.TimeFns
import graft.plans.DerivedLongBounds
import graft.sources.Tables

/** plans.DerivedLongBounds: filters on the derived micros column must
  * reach the parquet scan as raw-nanos bounds WITHOUT the caller using
  * Tables.tsUsBetween, and the added bounds must be exactly implied at
  * the division's rounding edges (floor vs truncate-toward-zero). */
class DerivedLongBoundsSpec extends SparkSpec {
  import spark.implicits._

  // live-session registration path (driver-owned sessions); idempotent
  if (!spark.experimental.extraOptimizations.contains(DerivedLongBounds))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DerivedLongBounds

  val dir = "/root/testdata/sf0.001"

  test("ts_us range filter pushes raw-nanos bounds into the parquet scan") {
    val ev = Tables.events(spark, dir)
    val Array(lo, hi) = ev.agg(min("ts_us"), max("ts_us")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid1 = lo + (hi - lo) / 3
    val mid2 = lo + 2 * (hi - lo) / 3

    val q = ev.filter(col("ts_us") >= mid1 && col("ts_us") <= mid2).select("event_id")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains(s"GreaterThanOrEqual(ts,${mid1 * 1000})"),
      s"derived lower nanos bound not pushed:\n$p")
    assert(p.contains(s"LessThanOrEqual(ts,${mid2 * 1000 + 999})"),
      s"derived upper nanos bound not pushed:\n$p")

    // and the rows equal the manual-pushdown convention's rows
    val manual = spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .filter(Tables.tsUsBetween(mid1, mid2))
      .filter(TimeFns.nanosToMicros(col("ts_ns")).between(mid1, mid2))
    assert(q.count() == manual.count() && q.count() > 0)
  }

  test("SQL DIV (truncate toward zero) bounds are exact at the zero edge") {
    (-3000L to 3000L).toDF("x").createOrReplaceTempView("div_xs")
    val got = spark.sql(
        "SELECT x FROM div_xs WHERE x DIV 1000 >= -2 AND x DIV 1000 <= 1")
      .collect().map(_.getLong(0)).toSet
    val want = (-3000L to 3000L).filter(v => v / 1000 >= -2 && v / 1000 <= 1).toSet
    assert(got == want) // [-2999, 1999]: truncation admits -2999..-2001 and -999..-1
  }

  test("ldiv (floor) equality bounds are exact for negative quotients") {
    val got = (-3000L to 3000L).toDF("x")
      .filter(TimeFns.ldiv(col("x"), 1000L) === -1L)
      .collect().map(_.getLong(0)).toSet
    assert(got == (-1000L to -1L).toSet) // floor(x/1000) == -1
  }

  test("strict comparisons derive the off-by-one bound") {
    (-3000L to 3000L).toDF("x").createOrReplaceTempView("div_xs2")
    val got = spark.sql("SELECT x FROM div_xs2 WHERE x DIV 1000 > 0 AND 2 > x DIV 1000")
      .collect().map(_.getLong(0)).toSet
    val want = (-3000L to 3000L).filter(v => v / 1000 > 0 && v / 1000 < 2).toSet
    assert(got == want) // [1000, 1999]
  }
}
