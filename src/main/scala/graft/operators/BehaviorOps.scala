package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event log (beyond-reference; the shapes a
  * product team runs on the same events the store replays). All single- or
  * two-shuffle plans keyed on the aggregate id — they reuse the storage
  * layout's bucketing, so at 100 TB the sessionize/funnel shuffles are
  * co-located with the event-log partitioning.
  */
object BehaviorOps {

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event of the same key exceeds `gapUs`. Returns the input plus
    * (session_id) — session_id is a per-key running count, deterministic
    * given the (tsCol, tieCol) total order.
    *
    * Hot-key skew: one key's timeline is one window partition/task (AQE
    * does not split window partitions). Correct regardless of the input
    * distribution (SkewSpec pins a 90%-hot-key run); for a key too large
    * for one task, compute per-(key, time-chunk) boundaries first and
    * prefix-sum session counts across chunks — the tokenPacking two-phase
    * shape. */
  def sessionize(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts_us",
      tieCol: String = "event_id",
      gapUs: Long = 21600000000L): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col(tsCol) - col("prev_ts") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .drop("prev_ts", "new_session")
  }

  /** N-step ordered funnel: for each key, the first time of step i that
    * happens AFTER the matched time of step i-1 is found greedily. Missing
    * steps yield 0 (non-null outputs survive engine round trips). Returns
    * one row per key with `<step>_us` columns.
    *
    * One aggregation pass: per (key, step) ordered event-time lists, then a
    * driver-free fold across the step columns. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      keyCol: String = "user_id",
      etCol: String = "event_type",
      tsCol: String = "ts_us"): DataFrame = {
    require(steps.nonEmpty)
    // per key: sorted ts list per step (collect_list drops the nulls the
    // unmatched when() branches produce)
    def listFor(s: String): Column =
      sort_array(collect_list(when(col(etCol) === s, col(tsCol)))).as(s)
    val lists = events
      .filter(col(etCol).isin(steps: _*))
      .groupBy(col(keyCol))
      .agg(listFor(steps.head), steps.tail.map(listFor): _*)
    // fold: step i time = first element in its list > step i-1 time
    // (try_element_at: empty list -> null, not an ANSI index error)
    val first = try_element_at(col(steps.head), lit(1))
    var out = lists.withColumn(s"${steps.head}_us", coalesce(first, lit(0L)))
    steps.sliding(2).foreach {
      case Seq(prev, s) =>
        val prevTs = col(s"${prev}_us")
        val nextTs = array_min(filter(col(s), t => t > prevTs))
        out = out.withColumn(s"${s}_us",
          coalesce(when(prevTs > 0, nextTs), lit(0L)))
      case _ => ()
    }
    out.select(col(keyCol) +: steps.map(s => col(s"${s}_us")): _*)
  }

  /** Top-k rows per group by an ordering (window row_number pattern). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(groupCols: _*).orderBy(order: _*)))
      .filter(col("rn") <= k)
}
