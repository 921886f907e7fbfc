package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row
import graft.functions.TimeFns

/** Structured Streaming extensions (SURVEY.md §7 step 10 — additive; the
  * reference has no streaming engine, its "replay" is batch streaming).
  *
  * Semantics carried over from the reference:
  *  - the message counter (Counters/MessageCounter.cs) becomes a stateful
  *    streaming aggregation in update mode — same commutative-increment
  *    behavior, exactly-once instead of Cassandra counter-column
  *    at-least-once;
  *  - the replay over-scan padding (+1 day `before`, +2 day pid guard,
  *    IndexByEventTypeStore.cs:181,251-257) becomes the watermark: late
  *    events inside the padding still count, later ones are dropped
  *    explicitly rather than silently.
  *
  * All transforms are DataFrame->DataFrame so they run identically on
  * `readStream` sources and on batch frames in tests.
  */
object StreamingOps {

  /** Tail the events table as a stream (new parquet files under `path`
    * are the append log; at cluster scale this is the landing zone the
    * batch writer Storage.appendEvents feeds). */
  def streamEvents(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Live message counter: counts per event type over the stream.
    * Update-mode stateful aggregation == MessageCounter's `cv = cv + n`. */
  def liveCounters(events: DataFrame, etCol: String = "et"): DataFrame =
    events.groupBy(col(etCol).as("msgid")).agg(count(lit(1)).as("cv"))

  /** Windowed replay counts with the reference's over-scan tolerance:
    * 1-day tumbling windows (the index's pid granularity) per event type,
    * watermarked by `latenessDays` (default = the reference's +2d guard). */
  def dailyTypeCounts(
      events: DataFrame,
      tsCol: String = "ts_t",
      etCol: String = "et",
      latenessDays: Int = 2): DataFrame =
    events
      .withWatermark(tsCol, s"$latenessDays days")
      .groupBy(window(col(tsCol), "1 day"), col(etCol).as("et"))
      .agg(count(lit(1)).as("n"))
      .select(
        TimeFns.pid(col("window.start")).as("pid"),
        col("et"), col("n"))

  /** Continuous index maintenance: the A6 index derivation as a streaming
    * projection — appends (et, pid, aid, rev, pos, ts) rows as events
    * arrive (the reference's IIndexStore write path, made incremental). */
  def indexStream(events: DataFrame): DataFrame =
    graft.operators.IndexOps.buildIndex(events)

  /** Write a streaming frame to a memory sink for inspection/tests. */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(mode)
}
