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
    Storage.createStorage(root, "tenant1", "ks")(spark)
    assert(new java.io.File(s"$root/tenant1_ks/events").isDirectory)
    intercept[IllegalArgumentException] {
      // another tenant must not be able to wipe tenant1's keyspace
      Storage.wipe(root, "tenant2", Storage.keyspaceDir("tenant1", "ks"))(spark)
    }
    Storage.wipe(root, "tenant1", Storage.keyspaceDir("tenant1", "ks"))(spark)
    assert(!new java.io.File(s"$root/tenant1_ks").exists())
  }

  test("readAggregate prunes to one bucket directory and matches a full scan") {
    val dir = tmpDir()
    val rows = (1 to 50).flatMap { a =>
      (1 to 4).map(r => (s"agg-$a".getBytes, r, 0, 1000L + r, s"e$r".getBytes))
    }.toDF("id", "rev", "pos", "ts", "data")
    Storage.appendEvents(rows, s"$dir/events", nBuckets = 8)
    val got = Storage.readAggregate(spark, s"$dir/events", "agg-7".getBytes, nBuckets = 8)
    // correctness: same rows as an unpruned filter, in clustering order
    assert(got.collect().map(_.getAs[Int]("rev")).toSeq == Seq(1, 2, 3, 4))
    // pruning: the physical plan carries a bucket partition filter
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"))
    // and the scan reads exactly one of the 8 bucket directories
    // (input_file_name must be read at the scan, before the sort exchange)
    val allDirs = new java.io.File(s"$dir/events").listFiles().count(_.getName.startsWith("bucket="))
    assert(allDirs == 8)
    val bucket = spark.range(1)
      .select(pmod(xxhash64(lit("agg-7".getBytes)), lit(8)).cast("int")).head.getInt(0)
    // the driver-side routing hash must agree with the writer's expression
    assert(Storage.bucketOf("agg-7".getBytes, 8) == bucket)
    val read = spark.read.parquet(s"$dir/events")
      .filter(col("bucket") === bucket && col("id") === lit("agg-7".getBytes))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(read.nonEmpty && read.forall(_.contains(s"bucket=$bucket")))
  }

  test("deleteAndRewrite physically removes tombstoned rows, touching only their buckets") {
    val dir = tmpDir()
    val rows = (1 to 20).flatMap { a =>
      (1 to 3).map(r => (s"agg-$a".getBytes, r, 0, 100L + r, s"e$r".getBytes))
    }.toDF("id", "rev", "pos", "ts", "data")
    Storage.appendEvents(rows, s"$dir/events", nBuckets = 4)
    val tombBucket = Storage.bucketOf("agg-7".getBytes, 4)
    // snapshot the files of one UNAFFECTED bucket before the rewrite
    val otherBucket = (0 until 4).filterNot(_ == tombBucket).head
    def files(b: Int) = new java.io.File(s"$dir/events/bucket=$b")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq
    val otherBefore = files(otherBucket)
    val tomb = Seq(("agg-7".getBytes, 2, 0)).toDF("id", "rev", "pos")
    Storage.deleteAndRewrite(spark, s"$dir/events", tomb, nBuckets = 4)
    // the tombstoned row is physically gone; everything else survived
    val back = spark.read.parquet(s"$dir/events")
    assert(back.count() == 59)
    assert(back.filter(col("id") === lit("agg-7".getBytes) && col("rev") === 2).count() == 0)
    assert(back.filter(col("id") === lit("agg-7".getBytes)).count() == 2)
    // unaffected buckets were not rewritten (same physical files)
    assert(files(otherBucket) == otherBefore)
    // the affected bucket WAS rewritten
    assert(files(tombBucket).nonEmpty)
    // deleting every row of an aggregate set leaves no stale bucket dir
    val allTomb = rows.filter(col("id") === lit("agg-3".getBytes))
      .select("id", "rev", "pos")
    Storage.deleteAndRewrite(spark, s"$dir/events", allTomb, nBuckets = 4)
    assert(spark.read.parquet(s"$dir/events")
      .filter(col("id") === lit("agg-3".getBytes)).count() == 0)
  }

  test("ORC storage format round-trips with the same layout") {
    val dir = tmpDir()
    val rows = Seq(
      ("o1".getBytes, 1, 0, 10L, "x".getBytes),
      ("o2".getBytes, 1, 0, 20L, "y".getBytes))
      .toDF("id", "rev", "pos", "ts", "data")
    Storage.appendEvents(rows, s"$dir/events", nBuckets = 4, format = "orc")
    val back = Storage.readEvents(spark, s"$dir/events", format = "orc")
    assert(back.count() == 2)
    assert(back.columns.contains("bucket"))
  }

  test("json payload decode/encode at the serializer boundary") {
    val rows = Seq(("a".getBytes, 1, 0, 10L, """{"k": 87, "name": "ev"}""".getBytes))
      .toDF("id", "rev", "pos", "ts", "data")
    val decoded = graft.operators.SerdeOps.decodeJson(rows, "k BIGINT, name STRING")
    val r = decoded.select(col("payload.k"), col("payload.name")).head
    assert(r.getLong(0) == 87L && r.getString(1) == "ev")
    val encoded = rows.select(graft.operators.SerdeOps.encodeJson(rows,
      lit(87).as("k")).as("json")).head.getString(0)
    assert(encoded == """{"k":87}""")
  }

  test("binary envelope serializer: byte-exact round trip, dead-letter passthrough") {
    import graft.operators.SerdeOps
    // payload bytes are OPAQUE — include non-UTF8 bytes to pin that the
    // envelope never reinterprets them
    val raw = Array[Byte](0x00, 0x7F, -1, -128, 42)
    val rows = Seq((1L, raw), (2L, "plain bytes, no envelope".getBytes))
      .toDF("event_id", "payload")
    // enveloped: round trip restores schema id and the exact bytes
    val rt = rows.filter(col("event_id") === 1)
      .select(SerdeOps.decodeEnvelope(
        SerdeOps.encodeEnvelope(col("payload"), 7)).as("env"))
      .select(col("env.schema_id"), col("env.payload")).head
    assert(rt.getInt(0) == 7)
    assert(rt.getAs[Array[Byte]](1).sameElements(raw))
    // non-envelope bytes: NULL schema id, payload unchanged (dead-letter
    // route — the boundary drops/mutates nothing)
    val dl = rows.filter(col("event_id") === 2)
      .select(SerdeOps.decodeEnvelope(col("payload")).as("env"))
      .select(col("env.schema_id"), col("env.payload")).head
    assert(dl.isNullAt(0))
    assert(new String(dl.getAs[Array[Byte]](1)) == "plain bytes, no envelope")
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

  test("withProgress reports per-task progress during a replay action") {
    val rows = (1 to 100).map(i => (s"agg-${i % 5}".getBytes, i, 0, i.toLong, "d".getBytes))
      .toDF("id", "rev", "pos", "ts", "data")
      .repartition(4)
    val updates = new java.util.concurrent.atomic.AtomicLong(0)
    val n = graft.operators.ProgressOps.withProgress(rows,
      _ => { updates.incrementAndGet(); () })(_.count())
    assert(n == 100L)
    // listener delivery is async; poll briefly for the callbacks
    val deadline = System.nanoTime() + 3000000000L
    while (updates.get() < 4 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(updates.get() >= 4) // at least one callback per task
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
