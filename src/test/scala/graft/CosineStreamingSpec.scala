package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.{TimeFns, VectorFns}
import graft.plans.GraftFunctions
import graft.streaming.StreamingOps

class CosineStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("native graft_cosine is bit-identical to the built-in formulation") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0, -4.0), Seq(0.5, -2.5, 3.0, 4.0)),
      (Seq(0.001, 1e9, -1e-9, 42.0), Seq(7.0, 1e-9, 1e9, -42.0)),
    ).toDF("a", "b")
    val got = df.select(
      GraftFunctions.cosine(col("a"), col("b")).as("fast"),
      VectorFns.cosine(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_cosine accepts float arrays through implicit casts") {
    GraftFunctions.register(spark)
    val one = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(one == 1.0)
  }

  test("graft_cosine is null-safe") {
    GraftFunctions.register(spark)
    val r = Seq((Seq(1.0), null.asInstanceOf[Seq[Double]])).toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("native intersection size matches size(array_intersect) on distinct arrays") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("x"), Seq("y")),
      (Seq.empty[String], Seq("a")),
    ).toDF("a", "b")
    val got = df.select(
      GraftFunctions.intersectionSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("streaming liveCounters fold new files incrementally (update mode)") {
    val dir = tmpDir()
    val mk = (ids: Seq[(Long, String)]) => ids.toDF("rev", "et")
      .withColumn("id", lit("agg".getBytes))
      .withColumn("pos", lit(0))
      .withColumn("ts", lit(TimeFns.FileTimeEpochTicks))
      .withColumn("data", lit(Array.emptyByteArray))
    val schema = mk(Seq((1L, "click"))).schema
    mk(Seq((1L, "click"), (2L, "click"), (3L, "view")))
      .write.mode("append").parquet(s"$dir/in")
    val stream = StreamingOps.streamEvents(spark, s"$dir/in", schema)
    val q = StreamingOps.toMemorySink(
        StreamingOps.liveCounters(stream), "live_counters", OutputMode.Complete())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val c1 = spark.table("live_counters").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(c1 == Map("click" -> 2L, "view" -> 1L))
      // second file lands -> counters advance incrementally
      mk(Seq((4L, "click"))).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val c2 = spark.table("live_counters").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(c2 == Map("click" -> 3L, "view" -> 1L))
    } finally q.stop()
  }

  test("streaming ingest lands micro-batches in the bucketed layout") {
    val dir = tmpDir()
    val mkRows = (revs: Seq[Int]) => revs.toDF("rev")
      .withColumn("id", lit("stream-agg".getBytes))
      .withColumn("pos", lit(0))
      .withColumn("ts", lit(1000L))
      .withColumn("data", lit("d".getBytes))
      .select("id", "rev", "pos", "ts", "data")
    val schema = mkRows(Seq(1)).schema
    mkRows(Seq(1, 2)).write.mode("append").parquet(s"$dir/in")
    val q = StreamingOps.ingestTo(
      spark.readStream.schema(schema).parquet(s"$dir/in"),
      s"$dir/store", s"$dir/ckpt", nBuckets = 4).start()
    try {
      q.processAllAvailable()
      mkRows(Seq(3)).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val back = graft.sources.Storage.readEvents(spark, s"$dir/store")
      assert(back.count() == 3)
      assert(back.select("bucket").distinct().count() == 1) // one aggregate -> one bucket
      val pruned = graft.sources.Storage.readAggregate(
        spark, s"$dir/store", "stream-agg".getBytes, nBuckets = 4)
      assert(pruned.collect().map(_.getAs[Int]("rev")).toSeq == Seq(1, 2, 3))
    } finally q.stop()
  }

  test("incrementalExactStream: stream-static digest join lands copies per micro-batch") {
    val dir = tmpDir()
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val mkInc = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    mkInc(Seq((10L, "alpha beta"), (11L, "novel text"))).write.mode("append").parquet(s"$dir/in")
    val schema = corpus.schema
    val src = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingOps.incrementalExactStream(src, corpus)
      .writeStream.format("memory").queryName("inc_pairs")
      .outputMode(OutputMode.Append()).option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val got1 = spark.table("inc_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got1 == Set((10L, 1L), (10L, 3L))) // both corpus copies, novel absent
      // second micro-batch joins the same static corpus independently
      mkInc(Seq((12L, "gamma delta"))).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got2 = spark.table("inc_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 == Set((10L, 1L), (10L, 3L), (12L, 2L)))
    } finally q.stop()
  }

  test("attributionPairs: stream-stream join emits in-window pairs exactly once") {
    val dir = tmpDir()
    val hourUs = 3600000000L
    val mk = (rows: Seq[(Long, Long, String, Long)]) => rows
      .toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts_t", timestamp_micros(col("us")))
      .select("user_id", "event_id", "event_type", "ts_t")
    // user 1: views at t=1h,3h,9h; purchase at t=9h30' (6h window: views
    // at 3h30'..9h30' -> 9h qualifies, 3h qualifies? 9.5-6=3.5h -> NO;
    // 1h no). user 2: purchase with no views.
    val rows = Seq(
      (1L, 10L, "view", 1 * hourUs),
      (1L, 11L, "view", 3 * hourUs),
      (1L, 12L, "view", 9 * hourUs),
      (1L, 20L, "purchase", 9 * hourUs + hourUs / 2),
      (2L, 21L, "purchase", 5 * hourUs))
    mk(rows).write.mode("append").parquet(s"$dir/in")
    val schema = mk(rows).schema
    val src = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingOps.attributionPairs(src, "view", "purchase", windowUs = 6 * hourUs)
      .writeStream.format("memory").queryName("attrib_pairs")
      .outputMode(OutputMode.Append()).option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("attrib_pairs")
        .select("purchase_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((20L, 12L)))
      // a later view inside a later purchase's window arrives -> exactly
      // one new pair, the old one is not re-emitted (append semantics)
      mk(Seq((2L, 22L, "view", 5 * hourUs + 1), (2L, 23L, "purchase", 6 * hourUs)))
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got2 = spark.table("attrib_pairs")
        .select("purchase_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got2.size == 2 && got2.toSet == Set((20L, 12L), (23L, 22L)))
    } finally q.stop()
  }

  test("dedupedEvents drops re-delivered rows across micro-batches") {
    val dir = tmpDir()
    val mk = (rows: Seq[(Int, String)]) => rows.toDF("rev", "t")
      .select(lit("dup-agg".getBytes).as("id"), col("rev"), lit(0).as("pos"),
        to_timestamp(col("t")).as("ts_t"))
    val schema = mk(Seq((1, "2024-01-10 00:00:00"))).schema
    mk(Seq((1, "2024-01-10 00:00:00"), (2, "2024-01-10 01:00:00")))
      .write.mode("append").parquet(s"$dir/in")
    val q = StreamingOps.toMemorySink(
        StreamingOps.dedupedEvents(
          spark.readStream.schema(schema).parquet(s"$dir/in"), "ts_t"),
        "deduped", OutputMode.Append())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // redelivery of rev 1 (same id/rev/pos) plus a genuinely new rev 3
      mk(Seq((1, "2024-01-10 00:00:00"), (3, "2024-01-10 02:00:00")))
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val revs = spark.table("deduped").collect().map(_.getAs[Int]("rev")).sorted.toSeq
      assert(revs == Seq(1, 2, 3)) // the duplicate rev-1 landed exactly once
    } finally q.stop()
  }

  test("revisionMonitor flags gaps and conflicts per aggregate across batches") {
    val dir = tmpDir()
    val mk = (rows: Seq[(String, Int)]) => rows.toDF("idB64", "rev")
    val schema = mk(Seq(("a", 1))).schema
    mk(Seq(("a", 1), ("a", 2), ("b", 1))).write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingOps.revisionMonitor(stream)
      .toDF("id", "rev", "status")
      .writeStream.format("memory").queryName("rev_monitor")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // second batch: a replays rev 2 (conflict), b skips to rev 3 (gap)
      mk(Seq(("a", 2), ("b", 3))).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("rev_monitor").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(got == Set(
        ("a", 1, "ok"), ("a", 2, "ok"), ("b", 1, "ok"),
        ("a", 2, "conflict"), ("b", 3, "gap")))
    } finally q.stop()
  }

  test("watermark drops events later than the over-scan padding (append mode)") {
    val dir = tmpDir()
    val mk = (rows: Seq[(String, String)]) => rows.toDF("t", "et")
      .select(to_timestamp(col("t")).as("ts_t"), col("et"))
    val schema = mk(Seq(("2024-01-10 01:00:00", "click"))).schema
    // batch 1: events on Jan 10 + a Jan 20 event that pushes the
    // watermark to Jan 18 (2-day padding), closing the Jan-10 window
    mk(Seq(
      ("2024-01-10 01:00:00", "click"),
      ("2024-01-10 02:00:00", "click"),
      ("2024-01-20 00:00:00", "view")))
      .write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingOps.toMemorySink(
        StreamingOps.dailyTypeCounts(stream), "late_counts", OutputMode.Append())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: a straggler inside the closed Jan-10 window -> dropped
      // (the reference would equally miss it: outside the +2d pid guard)
      mk(Seq(("2024-01-10 03:00:00", "click"))).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // an advancing batch so finalized windows flush to the append sink
      mk(Seq(("2024-01-25 00:00:00", "view"))).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val jan10 = spark.table("late_counts")
        .filter(col("pid") === 2024010).collect()
      assert(jan10.length == 1)
      // count stays 2: the late third click never landed
      assert(jan10.head.getAs[Long]("n") == 2L)
    } finally q.stop()
  }

  test("streaming dailyTypeCounts buckets by pid with watermark") {
    val dir = tmpDir()
    val rows = Seq(
      ("2024-01-10 01:00:00", "click"),
      ("2024-01-10 02:00:00", "click"),
      ("2024-01-11 01:00:00", "view"))
      .toDF("t", "et")
      .select(to_timestamp(col("t")).as("ts_t"), col("et"))
    rows.write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.schema).parquet(s"$dir/in")
    val q = StreamingOps.toMemorySink(
        StreamingOps.dailyTypeCounts(stream), "daily_counts", OutputMode.Complete())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("daily_counts").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((2024010, "click", 2L), (2024011, "view", 1L)))
    } finally q.stop()
  }

  test("decontamStream: probe-all emits exactly the threshold-flagged pairs; reduced probes subset") {
    // 2D fixture, two obvious cells: train along +x / +y; eval near +x
    // and near the diagonal
    val train = Seq(
      (100L, Seq(1.0f, 0.0f), 1), (101L, Seq(0.9f, 0.1f), 1),
      (102L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val evalE = Seq(
      (1L, Seq(1.0f, 0.05f), 0), (2L, Seq(0.6f, 0.8f), 0))
      .toDF("vec_id", "embedding", "label")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    def pairs(nProbe: Int) = StreamingOps.decontamStream(
        evalE, train, cents, nProbe, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // probe-all == the batch brute truth over the same threshold
    val brute = graft.operators.SimilarityOps.crossMaxCosine(
        evalE.unionByName(train), evalLabel = 0, trainLabel = 1, threshold = 0.9)
      .filter(col("contaminated"))
      .select(col("eval_id"), col("train_id"), col("sim"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val all = pairs(nProbe = 2)
    // the brute argmax rows are a subset of the flagged pair stream
    assert(brute.forall(all.contains), s"$brute not within $all")
    assert(all.forall(_._3 >= 0.9))
    // reduced probes emit a subset (never a fabricated pair)
    val one = pairs(nProbe = 1)
    assert(one.forall(all.contains))
  }
}
