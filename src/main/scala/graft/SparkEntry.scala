package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here is one operator row of SURVEY.md §2, expressed on the
  * driver test tables (role mapping FIXTURES.md §2: user_id = aggregate id,
  * event_type = et, event_id = revision order, props = opaque payload).
  *
  * Oracle-parity conventions (DuckDB 1.0 reads the same parquet):
  *  - `events.ts` is TIMESTAMP(NANOS) parquet: Spark reads it as epoch-nanos
  *    long (legacy nanosAsLong flag, set by Tables), DuckDB truncates to
  *    micros. All timestamp outputs are therefore epoch-micros longs:
  *    `ts div 1000` here == `epoch_us(ts)` there.
  *  - Large double sums are cast to DECIMAL on both sides (exact, order-
  *    independent); small-magnitude doubles (avgs) are round()ed.
  *  - DuckDB sum(BIGINT) is HUGEINT -> always CAST to BIGINT in SQL.
  *  - Every oracle-checked query ends in a total ORDER BY.
  */
object SparkEntry {

  // Inclusive replay window used by the time-filtered queries (B5/E4):
  // [2024-01-10, 2024-01-20] in epoch micros; events span 2024-01-01..30.
  private val T10: Long = TimeFns.utcMicros("2024-01-10T00:00:00")
  private val T20: Long = TimeFns.utcMicros("2024-01-20T00:00:00")
  private val SqlT10 = "TIMESTAMP '2024-01-10 00:00:00'"
  private val SqlT20 = "TIMESTAMP '2024-01-20 00:00:00'"

  /** Flagship (smoke, sf0.001): the reference's signature pipeline — replay
    * by event type (E1 index branch): day-pruned index range scan (E4) ->
    * join back to the log (C1) -> per-aggregate grouping (E3) -> counts. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val idx = ev.select(
      col("event_type").as("et"), col("pid").as("i_pid"),
      col("user_id").as("aid"), col("event_id").as("eid"), col("ts_us").as("i_ts"))
      .filter(col("et") === "purchase" && col("i_ts").between(T10, T20))
    ev.join(broadcast(idx), col("user_id") === col("aid") && col("event_id") === col("eid"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), min("ts_us").as("first_us"))
      .orderBy(col("user_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- B. projections / filters ------------------------------------
    "q_load_aggregate" -> { (s, dir) => // B1: one aggregate, clustering order
      Tables.events(s, dir)
        .filter(col("user_id") === 7)
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
          col("value"), col("props"))
        .orderBy(col("event_id"))
    },

    "q_load_desc" -> { (s, dir) => // B4: same partition, reverse order
      Tables.events(s, dir)
        .filter(col("user_id") === 7)
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
        .orderBy(col("event_id").desc)
    },

    "q_load_event" -> { (s, dir) => // B2: point lookup (first event of agg 7)
      Tables.events(s, dir)
        .filter(col("user_id") === 7)
        .orderBy(col("event_id"))
        .select(col("event_id"), col("ts_us"), col("props"))
        .limit(1)
    },

    "q_load_rebuild" -> { (s, dir) => // B3: narrowest projection, payload only
      Tables.events(s, dir)
        .filter(col("user_id") === 7)
        .orderBy(col("event_id"))
        .select(col("props"))
        .limit(1)
    },

    "q_ts_range" -> { (s, dir) => // B5/E2: inclusive time-range full scan
      Tables.events(s, dir)
        .filter(col("ts_us").between(T10, T20))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
        .orderBy(col("event_id"))
    },

    // ---- A6/E4/C1/C2: the by-event-type index ------------------------
    "q_index_build" -> { (s, dir) => // A6: index derivation from the log
      Tables.events(s, dir)
        .select(col("event_type").as("et"), col("pid"),
          col("user_id").as("aid"), col("event_id").as("eid"), col("ts_us"))
        .orderBy(col("et"), col("pid"), col("ts_us"), col("eid"))
    },

    "q_index_range" -> { (s, dir) => // E4: day-pruned index range read
      Tables.events(s, dir)
        .select(col("event_type").as("et"), col("pid"),
          col("user_id").as("aid"), col("event_id").as("eid"), col("ts_us"))
        .filter(col("et") === "purchase" &&
          col("pid").between(2024010, 2024020) &&
          col("ts_us").between(T10, T20))
        .orderBy(col("ts_us"), col("eid"))
    },

    "q_index_join" -> { (s, dir) => // C1: index -> events equi-join
      val ev = Tables.events(s, dir)
      val idx = ev
        .filter(col("event_type") === "purchase" && col("ts_us").between(T10, T20))
        .select(col("user_id").as("aid"), col("event_id").as("eid"))
      ev.join(broadcast(idx),
          col("user_id") === col("aid") && col("event_id") === col("eid"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"), col("value"))
        .orderBy(col("event_id"))
    },

    "q_semi_join" -> { (s, dir) => // C2: whole aggregates touched by a type
      val ev = Tables.events(s, dir)
      val touched = ev
        .filter(col("event_type") === "error" && col("ts_us").between(T10, T20))
        .select(col("user_id").as("aid")).distinct()
      ev.join(broadcast(touched), col("user_id") === col("aid"), "left_semi")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min("ts_us").as("first_us"),
          max("ts_us").as("last_us"))
        .orderBy(col("user_id"))
    },

    // ---- D/E. aggregation / replay -----------------------------------
    "q_aggregate_streams" -> { (s, dir) => // E3/D5: per-aggregate ordered stream
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          array_join(transform(array_sort(collect_list(col("event_id"))),
            _.cast("string")), ",").as("ids_csv"))
        .orderBy(col("user_id"))
    },

    "q_keyset_page" -> { (s, dir) => // E6: keyset pagination, page after rev 100
      Tables.events(s, dir)
        .filter(col("user_id") === 7 && col("event_id") > 100)
        .select(col("event_id"), col("ts_us"), col("event_type"))
        .orderBy(col("event_id"))
        .limit(10)
    },

    "q_min_ts" -> { (s, dir) => // D1: global min ts (default replay start)
      Tables.events(s, dir).agg(min("ts_us").as("min_ts_us"))
    },

    "q_message_counter" -> { (s, dir) => // D2: counter truth per message type
      Tables.events(s, dir)
        .groupBy(col("event_type").as("msgid"))
        .agg(count(lit(1)).as("cv"))
        .orderBy(col("msgid"))
    },

    "q_count_for_type" -> { (s, dir) => // D4 (fixed semantics): count one type
      Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("cnt"))
    },

    "q_daily_counts" -> { (s, dir) => // E4 partition math: per-day-pid counts
      Tables.events(s, dir)
        .groupBy(col("pid"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
        .orderBy(col("pid"))
    },

    "q_migration" -> { (s, dir) => // E9: read-transform (migration reclassify)
      Tables.events(s, dir)
        .select(
          col("event_id"), col("user_id"),
          upper(col("event_type")).as("et_migrated"),
          when(col("value") >= 100, "public").otherwise("private").as("visibility"),
          (col("ts_us") + 1000000L).as("ts_shifted_us"))
        .orderBy(col("event_id"))
    },

    // ---- Analytics headliners (scan->filter->join->agg->sort) --------
    "q1_pricing" -> { (s, dir) => // TPC-H Q1 shape on lineitem
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("decimal(38,2)").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("decimal(38,2)").as("sum_base"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("decimal(38,4)").as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    "q_top_segments" -> { (s, dir) => // broadcast dim join + agg
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("decimal(38,2)").as("sum_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
        .orderBy(col("c_mktsegment"))
    },
  )

  /** DuckDB-equivalent SQL per query (same tables, same column names, same
    * row order). */
  def oracleSql: Map[String, String] = Map(
    "q_load_aggregate" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, props
        |FROM events WHERE user_id = 7 ORDER BY event_id""".stripMargin,

    "q_load_desc" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |FROM events WHERE user_id = 7 ORDER BY event_id DESC""".stripMargin,

    "q_load_event" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, props
        |FROM events WHERE user_id = 7 ORDER BY event_id LIMIT 1""".stripMargin,

    "q_load_rebuild" ->
      """SELECT props FROM events WHERE user_id = 7 ORDER BY event_id LIMIT 1""".stripMargin,

    "q_ts_range" ->
      s"""SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
         |FROM events WHERE ts BETWEEN $SqlT10 AND $SqlT20
         |ORDER BY event_id""".stripMargin,

    "q_index_build" ->
      """SELECT event_type AS et, CAST(year(ts)*1000 + dayofyear(ts) AS INT) AS pid,
        |       user_id AS aid, event_id AS eid, epoch_us(ts) AS ts_us
        |FROM events ORDER BY et, pid, ts_us, eid""".stripMargin,

    "q_index_range" ->
      s"""SELECT event_type AS et, CAST(year(ts)*1000 + dayofyear(ts) AS INT) AS pid,
         |       user_id AS aid, event_id AS eid, epoch_us(ts) AS ts_us
         |FROM events
         |WHERE event_type = 'purchase'
         |  AND CAST(year(ts)*1000 + dayofyear(ts) AS INT) BETWEEN 2024010 AND 2024020
         |  AND ts BETWEEN $SqlT10 AND $SqlT20
         |ORDER BY ts_us, eid""".stripMargin,

    "q_index_join" ->
      s"""SELECT e.event_id, e.user_id, e.event_type, epoch_us(e.ts) AS ts_us, e.value
         |FROM events e
         |JOIN (SELECT user_id AS aid, event_id AS eid FROM events
         |      WHERE event_type = 'purchase' AND ts BETWEEN $SqlT10 AND $SqlT20) i
         |  ON e.user_id = i.aid AND e.event_id = i.eid
         |ORDER BY e.event_id""".stripMargin,

    "q_semi_join" ->
      s"""SELECT user_id, count(*) AS n_events,
         |       min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
         |FROM events
         |WHERE user_id IN (SELECT DISTINCT user_id FROM events
         |                  WHERE event_type = 'error' AND ts BETWEEN $SqlT10 AND $SqlT20)
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_aggregate_streams" ->
      """SELECT user_id, count(*) AS n_events,
        |       string_agg(event_id, ',' ORDER BY event_id) AS ids_csv
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_keyset_page" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type
        |FROM events WHERE user_id = 7 AND event_id > 100
        |ORDER BY event_id LIMIT 10""".stripMargin,

    "q_min_ts" ->
      "SELECT min(epoch_us(ts)) AS min_ts_us FROM events",

    "q_message_counter" ->
      """SELECT event_type AS msgid, count(*) AS cv
        |FROM events GROUP BY event_type ORDER BY msgid""".stripMargin,

    "q_count_for_type" ->
      "SELECT count(*) AS cnt FROM events WHERE event_type = 'click'",

    "q_daily_counts" ->
      """SELECT CAST(year(ts)*1000 + dayofyear(ts) AS INT) AS pid, count(*) AS n,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_migration" ->
      """SELECT event_id, user_id, upper(event_type) AS et_migrated,
        |       CASE WHEN value >= 100 THEN 'public' ELSE 'private' END AS visibility,
        |       epoch_us(ts) + 1000000 AS ts_shifted_us
        |FROM events ORDER BY event_id""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |            AS DECIMAL(38,4)) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_top_segments" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_price,
        |       round(avg(o_totalprice), 4) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
