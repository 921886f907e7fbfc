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
  * The testdata's `events.ts` parquet representation has varied across
  * driver generations — TIMESTAMP(NANOS) (readable only as epoch-nanos
  * long via `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (read as TIMESTAMP_NTZ) have both been observed —
  * so the loader DETECTS the representation from the file schema and
  * normalizes to one canonical shape: `ts_us` (epoch micros long, exactly
  * what DuckDB sees after its own ns->us truncation — oracle comparisons
  * stay on longs), `ts_ns` (epoch nanos long, micros*1000 when the file
  * has no sub-micro digits), `ts_t` (TimestampType). The legacy flag is
  * still set defensively (runtime-settable, inert on non-nanos files) so
  * driver-created sessions read nanos files too.
  */
object Tables {

  def withNanosAsLong(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Calendar-derived outputs (pid = year*1000+dayOfYear, hour()) are
    // session-timezone-sensitive and the oracle SQL assumes UTC; pin it here
    // (runtime-settable) so driver-owned sessions with another default agree.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // On a TIMESTAMP[_NTZ] events file every ts_us/ts_ns predicate is a
    // derived-chain filter — without this rule nothing but IsNotNull
    // reaches the scan. Register it with the loader (idempotent,
    // live-settable) so ANY session reading these tables prunes, not just
    // ones built through GraftSession.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DerivedLongBounds))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DerivedLongBounds
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    withNanosAsLong(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Inclusive micros-range predicate expressed on the ts_ns column.
    * A filter on the derived ts_us (a cast/divide chain) only pushes
    * IsNotNull into the parquet scan; the equivalent nano bounds
    * [lo*1000, hi*1000+999] push as a plain long range on a nanos-long
    * layout (stored event tables) and — via the DerivedLongBounds rule,
    * which walks the `unix_micros(cast(ts)) * 1000` chain back to the raw
    * column — as a TIMESTAMP_NTZ range on the micros testdata layout.
    * Either way row-group min/max skipping fires: the difference between
    * a pruned read and a full scan at 100 TB. */
  def tsUsBetween(loUs: Long, hiUs: Long) =
    col("ts_ns").between(loUs * 1000L, hiUs * 1000L + 999L)

  /** Epoch-micros long from a RAW events `ts` column, whatever its
    * parquet representation (see the object scaladoc). For TIMESTAMP_NTZ
    * the wall time IS the UTC instant (isAdjustedToUTC=false, generator
    * convention — the same reading DuckDB's epoch_us gives), so the cast
    * through the UTC session is exact. */
  def tsToMicros(c: org.apache.spark.sql.Column,
      t: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = t match {
    case org.apache.spark.sql.types.LongType => TimeFns.nanosToMicros(c)
    case _: org.apache.spark.sql.types.TimestampNTZType => unix_micros(c.cast("timestamp"))
    case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported events.ts representation $other — expected epoch-nanos " +
          "LONG (TIMESTAMP(NANOS) + nanosAsLong) or TIMESTAMP[_NTZ]")
  }

  /** events with derived time columns:
    * ts_ns (epoch nanos long), ts_us (epoch micros long),
    * ts_t (TimestampType, micros), pid (year*1000+dayOfYear).
    * The raw `ts` column is replaced by the canonical longs; on a
    * micros-representation file ts_ns carries micros*1000 (no sub-micro
    * digits exist to lose, and no oracle-checked output ever exposes
    * ts_ns raw — DuckDB could not see sub-micro digits either way). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    val base = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", TimeFns.nanosToMicros(col("ts_ns")))
      case t =>
        raw.withColumn("ts_us", tsToMicros(col("ts"), t))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
          .drop("ts")
    }
    base
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withColumn("pid", TimeFns.pid(timestamp_micros(col("ts_us"))))
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

  /** Export to sharded JSON-Lines — the interchange format
    * training-data pipelines actually exchange (one JSON object per
    * line, newline-safe by escaping, streamable by any consumer).
    * `repartition(nShards)` sets file count = write parallelism; at
    * 100 TB size nShards so files land in the 100 MB - 1 GB band. */
  def exportJsonl(df: DataFrame, path: String, nShards: Int): Unit = {
    require(nShards >= 1, "nShards must be >= 1")
    df.repartition(nShards)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).json(path)
  }

  /** Read a JSON-Lines corpus with an EXPLICIT schema — schema-on-read,
    * never inference: an inference pass scans the corpus a second time
    * at full size, and inferred types drift with the sample (a
    * numeric-looking id column becomes DOUBLE the day one row pads with
    * zeros). Malformed lines surface as nulls (Spark's PERMISSIVE
    * default) so one bad line cannot kill a 100 TB ingest; compose a
    * not-null filter on a required column to drop them explicitly. */
  def importJsonl(spark: SparkSession, path: String, schemaDDL: String): DataFrame =
    spark.read.schema(schemaDDL).json(path)
}
