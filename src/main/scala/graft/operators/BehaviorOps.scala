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

  /** Skew-proof sessionize: identical semantics to `sessionize`, but the
    * per-key timeline is split into fixed-width TIME CHUNKS so a hot key
    * spreads over (key span / chunkWidth) tasks instead of serializing on
    * one — the two-phase carry shape of CurationOps.tokenPacking:
    *
    *  1. window per (key, chunk): local lag + local session-start count;
    *  2. per-(key, chunk) aggregates (last ts, #starts) — a TINY frame —
    *     carry the previous chunk's last ts and the exclusive prefix sum
    *     of starts across chunks with one window over it;
    *  3. join the carries back on (key, chunk): a row's session id =
    *     chunk offset + local running count, and the first rows of a chunk
    *     decide their boundary against the carried last-event ts.
    *
    * Empty chunks need no handling: lag over the chunks that EXIST yields
    * the last preceding event time whatever the gap in chunk ids. The big
    * shuffles are keyed (key, chunk); only the per-chunk aggregate — two
    * longs per (key, chunk) — passes through a per-key window. */
  def sessionizeChunked(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts_us",
      tieCol: String = "event_id",
      gapUs: Long = 21600000000L,
      chunkWidthUs: Long = 86400000000L): DataFrame = {
    require(chunkWidthUs > 0, "chunkWidthUs must be positive")
    // exact FLOOR division (TimeFns.ldiv), not `DIV`: DIV truncates toward
    // zero, which would merge the chunks either side of ts=0 into one
    // double-width chunk for negative timestamps
    val cid = graft.functions.TimeFns.ldiv(col(tsCol), chunkWidthUs)
    val wLocal = Window.partitionBy(col(keyCol), col("__cid"))
      .orderBy(col(tsCol), col(tieCol))
    val cumLocal = wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // phase 1: chunk-local boundaries (the first row of a chunk is decided
    // in phase 3 against the carried previous-chunk last ts)
    val local = events
      .withColumn("__cid", cid)
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(wLocal))
      .withColumn("__local_start",
        when(col("__prev_ts").isNotNull && col(tsCol) - col("__prev_ts") > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("__local_sid", sum(col("__local_start")).over(cumLocal))
      .withColumn("__head", col("__prev_ts").isNull)
    // phase 2: per-(key, chunk) stats; carries via one window over the
    // tiny aggregate — last event ts of the PREVIOUS chunk, and the
    // exclusive prefix of session starts (head rows resolved here: a
    // chunk's head starts a session iff no previous chunk or gap exceeded)
    val wChunks = Window.partitionBy(col(keyCol)).orderBy(col("__cid"))
    val stats = local.groupBy(col(keyCol), col("__cid"))
      .agg(max(col(tsCol)).as("__last_ts"),
        sum(col("__local_start")).as("__starts"),
        min(col(tsCol)).as("__head_ts"))
      .withColumn("__carry_ts", lag(col("__last_ts"), 1).over(wChunks))
      .withColumn("__head_start",
        when(col("__carry_ts").isNull || col("__head_ts") - col("__carry_ts") > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("__offset",
        coalesce(sum(col("__starts") + col("__head_start"))
          .over(wChunks.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol).as("__k"), col("__cid").as("__c"),
        col("__head_start"), col("__offset"))
    // phase 3: session id = prior-chunk offset + head start + local count
    local
      .join(stats, col(keyCol) === col("__k") && col("__cid") === col("__c"))
      .withColumn("session_id",
        col("__offset") + col("__head_start") + col("__local_sid"))
      .drop("__cid", "__prev_ts", "__local_start", "__local_sid", "__head",
        "__k", "__c", "__head_start", "__offset")
  }

  /** N-step ordered funnel: for each key, the first time of step i that
    * happens AFTER the matched time of step i-1 is found greedily. Missing
    * steps yield 0 (non-null outputs survive engine round trips). Returns
    * one row per key with `<step>_us` columns.
    *
    * One aggregation pass: per (key, step) ordered event-time lists, then a
    * driver-free fold across the step columns. NOTE: collect_list builds a
    * key's whole step-event list in one reducer row — for corpora where
    * one key can hold a huge share of step events, use `funnelAgg` (same
    * semantics, min-agg chain, skew-safe; SkewSpec pins equality). */
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

  /** Skew-proof funnel: identical semantics to `funnel`, expressed as a
    * chain of min-aggregations — step i's time is min ts of step-i events
    * above step i-1's matched time, joined back per key. No per-key
    * collect_list: `funnel` materializes each key's full step-event list
    * in ONE reducer row (a hot key = one giant array in one task), while
    * this variant is hash-aggs with map-side combine plus equi-joins AQE
    * can skew-split — the 100 TB shape. k steps = k passes over the
    * step-filtered slice (tiny vs the corpus). */
  def funnelAgg(
      events: DataFrame,
      steps: Seq[String],
      keyCol: String = "user_id",
      etCol: String = "event_type",
      tsCol: String = "ts_us"): DataFrame = {
    require(steps.nonEmpty)
    val stepEv = events.filter(col(etCol).isin(steps: _*))
      .select(col(keyCol).as("__k"), col(etCol).as("__et"), col(tsCol).as("__t"))
    val base = stepEv.select(col("__k")).distinct()
    val first = stepEv.filter(col("__et") === steps.head)
      .groupBy(col("__k")).agg(min(col("__t")).as("__mt"))
    var out = base.join(first, Seq("__k"), "left")
      .select(col("__k"), coalesce(col("__mt"), lit(0L)).as(s"${steps.head}_us"))
    steps.sliding(2).foreach {
      case Seq(prev, s) =>
        val reached = out.filter(col(s"${prev}_us") > 0)
          .select(col("__k").as("__pk"), col(s"${prev}_us").as("__pt"))
        val nxt = stepEv.filter(col("__et") === s)
          .join(reached, col("__k") === col("__pk") && col("__t") > col("__pt"))
          .groupBy(col("__k")).agg(min(col("__t")).as("__mt"))
        out = out.join(nxt, Seq("__k"), "left")
          .withColumn(s"${s}_us", coalesce(col("__mt"), lit(0L)))
          .drop("__mt")
      case _ => ()
    }
    out.select(col("__k").as(keyCol) +: steps.map(s => col(s"${s}_us")): _*)
  }

  /** Top-k rows per group by an ordering (window row_number pattern). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(groupCols: _*).orderBy(order: _*)))
      .filter(col("rn") <= k)
}
