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

  test("ts_us range filter pushes raw bounds into the parquet scan") {
    val ev = Tables.events(spark, dir)
    val Array(lo, hi) = ev.agg(min("ts_us"), max("ts_us")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid1 = lo + (hi - lo) / 3
    val mid2 = lo + 2 * (hi - lo) / 3

    // the raw `ts` representation varies across driver testdata
    // generations (epoch-nanos long vs TIMESTAMP[_NTZ] micros — see
    // Tables); either way the derived-column filter must reach the scan
    // as a raw range on `ts`, not IsNotNull alone
    val q = ev.filter(col("ts_us") >= mid1 && col("ts_us") <= mid2).select("event_id")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts,"),
      s"derived lower raw bound not pushed:\n$p")
    assert(p.contains("LessThanOrEqual(ts,"),
      s"derived upper raw bound not pushed:\n$p")

    // the ts_ns convention (tsUsBetween's *1000 bounds — a multiply chain
    // on a micros file) must push the same way
    val q2 = ev.filter(Tables.tsUsBetween(mid1, mid2)).select("event_id")
    val p2 = q2.queryExecution.executedPlan.toString
    assert(p2.contains("GreaterThanOrEqual(ts,") && p2.contains("LessThanOrEqual(ts,"),
      s"ts_ns-convention bounds not pushed:\n$p2")

    // and the rows equal an independent derivation of the same range
    // (TimestampType arithmetic, no long-division chain for the rule to
    // rewrite) — plus both conventions agree
    val manual = ev.filter(col("ts_t").between(
      timestamp_micros(lit(mid1)), timestamp_micros(lit(mid2))))
    assert(q.count() == manual.count() && q.count() > 0)
    assert(q2.count() == q.count())
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

  test("property: random division shapes stay correct with the rule active") {
    // end-to-end through the OPTIMIZER, not just the bound math
    // (PropertySpec pins that): random divisor (positive, negative — which
    // the rule must leave alone), comparison op, operand side, floor vs
    // truncate semantics, Int vs Long literal, optional no-op cast around
    // the division — every combination must return exactly the rows plain
    // Scala arithmetic says, with DerivedLongBounds registered on the
    // session.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val xsRange = (-4000L to 4000L)
    val df = xsRange.toDF("x").cache()
    df.count(): Unit

    val gen = for {
      d <- Gen.oneOf(Gen.choose(1L, 3000L), Gen.oneOf(-1000L, -7L, -1L))
      b <- Gen.choose(-9L, 9L)
      op <- Gen.oneOf("geq", "gt", "leq", "lt", "eq")
      floorSem <- Gen.oneOf(true, false)
      litIsInt <- Gen.oneOf(true, false)
      flip <- Gen.oneOf(true, false)
      castWrap <- Gen.oneOf(true, false)
    } yield (d, b, op, floorSem, litIsInt, flip, castWrap)

    val prop = Prop.forAll(gen) { case (d, b, op, floorSem, litIsInt, flip, castWrap) =>
      val div0 = if (floorSem) TimeFns.ldiv(col("x"), d) else expr(s"x DIV $d")
      val divCol = if (castWrap) div0.cast("long") else div0
      val bLit = if (litIsInt) lit(b.toInt) else lit(b)
      val cond = (op, flip) match {
        case ("geq", false) => divCol >= bLit
        case ("gt", false)  => divCol > bLit
        case ("leq", false) => divCol <= bLit
        case ("lt", false)  => divCol < bLit
        case ("eq", false)  => divCol === bLit
        case ("geq", true)  => bLit >= divCol
        case ("gt", true)   => bLit > divCol
        case ("leq", true)  => bLit <= divCol
        case ("lt", true)   => bLit < divCol
        case ("eq", true)   => bLit === divCol
      }
      val got = df.filter(cond).collect().map(_.getLong(0)).toSet
      def q(x: Long) = if (floorSem) Math.floorDiv(x, d) else x / d
      val want = xsRange.filter { x =>
        (op, flip) match {
          case ("geq", false) => q(x) >= b
          case ("gt", false)  => q(x) > b
          case ("leq", false) => q(x) <= b
          case ("lt", false)  => q(x) < b
          case ("eq", false)  => q(x) == b
          case ("geq", true)  => b >= q(x)
          case ("gt", true)   => b > q(x)
          case ("leq", true)  => b <= q(x)
          case ("lt", true)   => b < q(x)
          case ("eq", true)   => b == q(x)
        }
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
    df.unpersist(): Unit
  }
}
