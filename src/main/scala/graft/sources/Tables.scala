package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §2) and the
  * mapping from the `events` stream table onto the reference's event-log
  * schema `(id, rev, pos, ts, data)`
  * (/root/reference/src/One.Inception.EventStore.Cassandra/
  * CassandraEventStoreSchema.cs:15, CassandraColumn.cs:5-9).
  *
  * The testdata writes `events.ts` as parquet TIMESTAMP(NANOS), which Spark
  * only reads with `spark.sql.legacy.parquet.nanosAsLong` — the loader sets
  * it defensively on every session (it is runtime-settable) so driver-created
  * sessions work too. With the flag on, `ts` arrives as epoch-nanos long; we
  * expose `ts_us` (epoch micros, floor) which is exactly what DuckDB sees
  * after its own ns->us truncation — oracle comparisons stay on longs.
  */
object Tables {

  def withNanosAsLong(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Calendar-derived outputs (pid = year*1000+dayOfYear, hour()) are
    // session-timezone-sensitive and the oracle SQL assumes UTC; pin it here
    // (runtime-settable) so driver-owned sessions with another default agree.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    withNanosAsLong(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Inclusive micros-range predicate expressed on the RAW ts_ns column.
    * A filter on the derived ts_us (a cast/divide chain) only pushes
    * IsNotNull into the parquet scan; the equivalent nano bounds
    * [lo*1000, hi*1000+999] push as a plain long range and enable
    * row-group min/max skipping — the difference between a pruned read and
    * a full scan at 100 TB. */
  def tsUsBetween(loUs: Long, hiUs: Long) =
    col("ts_ns").between(loUs * 1000L, hiUs * 1000L + 999L)

  /** events with derived time columns:
    * ts_ns (epoch nanos long), ts_us (epoch micros long),
    * ts_t (TimestampType, micros), pid (year*1000+dayOfYear). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events").withColumnRenamed("ts", "ts_ns")
    raw
      .withColumn("ts_us", TimeFns.nanosToMicros(col("ts_ns")))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withColumn("pid", TimeFns.pid(timestamp_micros(TimeFns.nanosToMicros(col("ts_ns")))))
  }

  /** The `events` test table projected onto the reference event-log schema:
    * id = user_id (aggregate root id), rev = event_id (commit revision —
    * every event its own commit), pos = 0, ts = FileTime, data = props
    * (opaque payload). See SURVEY.md §7 for the role mapping. */
  def eventLog(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").as("id"),
      col("event_id").cast("int").as("rev"),
      lit(0).as("pos"),
      TimeFns.microsToFileTime(col("ts_us")).as("ts"),
      col("props").as("data"),
      col("event_type").as("et"),
    )

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")

  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "supplier")

  def part(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "part")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "nation")

  def region(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "region")
}
