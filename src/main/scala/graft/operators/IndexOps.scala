package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** The by-event-type index (SURVEY.md §2 A6/A7/B6/D1/D4/E4; reference file
  * /root/reference/src/One.Inception.EventStore.Cassandra/IndexByEventTypeStore.cs).
  *
  * In the reference the index is a separate Cassandra table keyed
  * `((et, pid), ts, aid, rev, pos)` that client code maintains alongside the
  * event log. Here it is a *derived* DataFrame: built from the log in one
  * projection (A6) and persisted partitioned by (et, pid) so that
  * `filter(et = x && pid between ...)` is directory-level partition pruning —
  * the exact analogue of Cassandra's partition-key routing, but optimizer-
  * driven instead of hand-rolled in a pid loop (IndexByEventTypeStore.cs:193).
  */
object IndexOps {

  /** A6 index derivation (IndexByEventTypeStore.cs:44-61: one index row per
    * event row, pid computed from ts client-side; here: one projection).
    * Expects the canonical event-log schema plus an `et` column. `ts` is
    * FileTime. */
  def buildIndex(eventsWithEt: DataFrame): DataFrame =
    eventsWithEt.select(
      col("et"),
      TimeFns.pid(timestamp_micros(TimeFns.fileTimeToMicros(col("ts")))).as("pid"),
      col("id").as("aid"),
      col("rev"),
      col("pos"),
      col("ts"))

  /** E4 `GetRecordsAsync` (IndexByEventTypeStore.cs:174-258): all index
    * records for one event type in an inclusive FileTime range. The
    * reference iterates day partitions `CalculatePartition(after) ..
    * CalculatePartition(before)`; the pid between-filter below is the same
    * pruning, done by Catalyst against the (et, pid) partition layout. */
  def readRange(index: DataFrame, et: String, afterFt: Long, beforeFt: Long): DataFrame = {
    val afterPid = pidOfFileTime(afterFt)
    val beforePid = pidOfFileTime(beforeFt)
    index.filter(
      col("et") === et &&
        col("pid").between(afterPid, beforePid) &&
        col("ts").between(afterFt, beforeFt))
  }

  /** B6 `IndexReadQuery` (IndexByEventTypeStore.cs:260-276): one (et, pid)
    * partition. */
  def read(index: DataFrame, et: String, pid: Int): DataFrame =
    index.filter(col("et") === et && col("pid") === pid)

  /** D1 `IndexMinTsQuery` (IndexByEventTypeStore.cs:296-303): global min ts,
    * the default replay start. */
  def minTs(index: DataFrame): DataFrame =
    index.agg(min("ts").as("ts"))

  /** D4 `GetCountAsync` (IndexByEventTypeStore.cs:100-123) — dead code in
    * the reference (always returns 0); implemented with the *fixed*
    * semantics: count of index records for an event type. */
  def countForType(index: DataFrame, et: String): DataFrame =
    index.filter(col("et") === et).agg(count(lit(1)).as("cnt"))

  /** The reference's calendar walk over day partitions
    * (IndexByEventTypeStore.cs:193, PartitionCalculator.GetNext): the
    * ordered pids covering an inclusive FileTime range. readRange's
    * between-filter prunes to exactly this set; this enumerator exists for
    * callers that schedule per-day work (e.g. incremental backfills). */
  def pidsIn(afterFt: Long, beforeFt: Long): Seq[Int] = {
    val last = pidOfFileTime(beforeFt)
    Iterator.iterate(pidOfFileTime(afterFt))(TimeFns.nextPidOf)
      .takeWhile(_ <= last).toSeq
  }

  /** Scala-side pid of a FileTime (mirrors PartitionCalculator,
    * IndexByEventTypeStore.cs:330-336). */
  def pidOfFileTime(ft: Long): Int = {
    val us = (ft - TimeFns.FileTimeEpochTicks) / 10L
    val d = java.time.Instant.ofEpochSecond(us / 1000000L).atZone(java.time.ZoneOffset.UTC).toLocalDate
    TimeFns.pidOf(d)
  }
}
