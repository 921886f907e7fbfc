package graft

/** Plan-shape regression guards: these queries' scale story depends on
  * predicates reaching the parquet scan and small sides broadcasting —
  * assert it so a refactor can't silently regress the physical plan
  * (the round-1 pushdown bug: filters on a derived micros column pushed
  * only IsNotNull). */
class PlanRegressionSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_ts_range pushes the time range into the scan as long bounds") {
    val p = plan("q_ts_range")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThanOrEqual(ts,"),
      s"time range not pushed:\n$p")
  }

  test("q_load_aggregate pushes the aggregate-id equality into the scan") {
    val p = plan("q_load_aggregate")
    assert(p.contains("EqualTo(user_id,7)"), s"id filter not pushed:\n$p")
  }

  test("q_index_join broadcasts the index side") {
    val p = plan("q_index_join")
    assert(p.contains("BroadcastHashJoin"), s"index join not broadcast:\n$p")
    assert(p.contains("EqualTo(event_type,purchase)"), s"et filter not pushed:\n$p")
  }

  test("q1_pricing pushes the shipdate bound and aggregates partially") {
    val p = plan("q1_pricing")
    assert(p.contains("LessThanOrEqual(l_shipdate,"), s"shipdate not pushed:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, // partial + final
      s"no partial aggregation:\n$p")
  }

  test("q_semi_join stays a semi join with pushed filters") {
    val p = plan("q_semi_join")
    assert(p.contains("LeftSemi"), s"semi join lost:\n$p")
    assert(p.contains("EqualTo(event_type,error)"), s"et filter not pushed:\n$p")
  }
}
