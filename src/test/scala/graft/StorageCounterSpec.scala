package graft

import org.apache.spark.sql.functions._
import graft.operators.{CounterOps, EventStoreOps}
import graft.sources.Storage

class StorageCounterSpec extends SparkSpec {
  import spark.implicits._

  test("counter fold: increments, decrements, read, reset") {
    val log = Seq(("msg-a", 1L), ("msg-a", 5L), ("msg-a", -1L), ("msg-b", 1L))
      .toDF("msgid", "delta")
    val cv = CounterOps.counters(log).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cv == Map("msg-a" -> 5L, "msg-b" -> 1L))
    assert(CounterOps.getCount(log, "msg-a").head.getLong(1) == 5L)
    // reset appends a compensating delta; folding log+reset gives 0
    val reset = CounterOps.resetDeltas(log, "msg-a")
    val after = CounterOps.counters(log.unionByName(reset))
      .filter(col("msgid") === "msg-a").head.getLong(1)
    assert(after == 0L)
  }

  test("message store append partitions by day-truncated FileTime") {
    val dir = tmpDir()
    val dayTicks = 864000000000L
    val msgs = Seq(
      (graft.functions.TimeFns.FileTimeEpochTicks + 10L, "m1".getBytes),
      (graft.functions.TimeFns.FileTimeEpochTicks + dayTicks + 20L, "m2".getBytes))
      .toDF("ts", "data")
    Storage.appendMessages(msgs, s"$dir/messages")
    val back = spark.read.parquet(s"$dir/messages")
    assert(back.count() == 2)
    assert(back.select("date").distinct().count() == 2)
    val dates = back.select("date").collect().map(_.getLong(0)).sorted
    assert(dates.forall(_ % dayTicks == 0))
  }

  test("tenant path naming caps keyspace at 48 chars and wipe honors the guard") {
    val root = tmpDir()
    val longKs = "k" * 60
    val p = Storage.tablePath(root, "tenant1", longKs, "Events")
    assert(p.contains("tenant1_"))
    assert(p.split("/").init.last.length == 48)
    assert(p.endsWith("/events"))
    Storage.createStorage(root, "tenant1", "ks")
    assert(new java.io.File(s"$root/tenant1_ks/events").isDirectory)
    intercept[IllegalArgumentException] {
      // another tenant must not be able to wipe tenant1's keyspace
      Storage.wipe(root, "tenant2", Storage.keyspaceDir("tenant1", "ks"))
    }
    Storage.wipe(root, "tenant1", Storage.keyspaceDir("tenant1", "ks"))
    assert(!new java.io.File(s"$root/tenant1_ks").exists())
  }

  test("index-record delete anti-joins on the full primary key") {
    val idx = Seq(
      ("click", 2024001, "a".getBytes, 1, 0, 100L),
      ("click", 2024001, "a".getBytes, 2, 0, 200L),
      ("view", 2024002, "b".getBytes, 1, 0, 300L))
      .toDF("et", "pid", "aid", "rev", "pos", "ts")
    val tomb = idx.filter(col("rev") === 2)
    val left = Storage.deleteIndexRecords(idx, tomb)
    assert(left.count() == 2)
    assert(left.filter(col("rev") === 2).count() == 0)
  }

  test("aggregateStreamsSorted matches the collect_list formulation") {
    val rows = Seq(
      ("a".getBytes, 1, 0, 10L, "x".getBytes),
      ("a".getBytes, 2, 0, 20L, "y".getBytes),
      ("b".getBytes, 1, 0, 30L, "z".getBytes),
      ("b".getBytes, 1, 5, 30L, "p".getBytes))
      .toDF("id", "rev", "pos", "ts", "data")
    val viaAgg = EventStoreOps.aggregateStreams(rows)
      .select(col("id").cast("string"), col("n_events")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSorted = EventStoreOps.aggregateStreamsSorted(rows)
      .select(col("id").cast("string"), col("n_events")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaSorted && viaAgg == Map("a" -> 2L, "b" -> 2L))
    // stream ordering inside a group is (rev, pos)
    val s = EventStoreOps.aggregateStreamsSorted(rows)
      .filter(col("id").cast("string") === "b")
      .select(explode(col("stream.pos"))).collect().map(_.getInt(0)).toSeq
    assert(s == Seq(0, 5))
  }

  test("replayForeach visits every event exactly once") {
    val rows = Seq(("a".getBytes, 1, 0, 10L, "x".getBytes),
      ("b".getBytes, 1, 0, 20L, "y".getBytes))
      .toDF("id", "rev", "pos", "ts", "data")
    val acc = spark.sparkContext.longAccumulator("seen")
    EventStoreOps.replayForeach(rows)(_ => acc.add(1))
    assert(acc.value == 2L)
  }
}
