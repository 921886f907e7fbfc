package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{EventStoreOps, PagingToken}
import graft.sources.Storage

class MigrationPagingSpec extends SparkSpec {

  test("paging token round-trips and rejects garbage") {
    val t = PagingToken.Token(7, 5, hasMore = true)
    assert(PagingToken.decode(PagingToken.encode(t)).contains(t))
    assert(PagingToken.decode("not-base64!").isEmpty)
    assert(PagingToken.decode(
      java.util.Base64.getEncoder.encodeToString("{}".getBytes)).isEmpty)
  }

  test("paged load driven by tokens covers the aggregate exactly once") {
    import spark.implicits._
    val rows = (1 to 9).map(r => ("agg".getBytes, r, 0, 100L + r, s"e$r".getBytes))
      .toDF("id", "rev", "pos", "ts", "data")
    var token: Option[PagingToken.Token] = None
    var seen = Vector.empty[Int]
    var pages = 0
    while (pages == 0 || token.exists(_.hasMore)) {
      val page = EventStoreOps.loadWithPaging(
        rows, lit("agg".getBytes), token.map(t => (t.rev, t.pos)), take = 4)
        .collect()
      seen ++= page.map(_.getAs[Int]("rev"))
      token = page.lastOption.map(r =>
        PagingToken.Token(r.getAs[Int]("rev"), r.getAs[Int]("pos"), page.length == 4))
      pages += 1
    }
    assert(seen == (1 to 9).toVector)
    assert(pages == 3) // 4 + 4 + 1
  }

  test("funnel: greedy ordered matching with missing steps as 0") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE signup only -> purchase unmatched
      (2L, 10L, "purchase"), (2L, 20L, "signup"), (2L, 25L, "view"),
      // user 3: never signed up
      (3L, 10L, "view"), (3L, 20L, "purchase"))
      .toDF("user_id", "ts_us", "event_type")
    val got = graft.operators.BehaviorOps
      .funnel(ev, Seq("signup", "view", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 10L, 20L, 30L),
      (2L, 20L, 25L, 0L),  // view at 25 matches after signup; no later purchase
      (3L, 0L, 0L, 0L)))   // head step missing -> nothing matches
  }

  test("sessionize splits on gaps and topKPerGroup ranks within keys") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L, 100L), (1L, 1L, 1000L), (1L, 2L, 50000L),
      (2L, 3L, 10L))
      .toDF("user_id", "event_id", "ts_us")
    val sessions = graft.operators.BehaviorOps
      .sessionize(ev, gapUs = 10000L)
      .select("user_id", "event_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2).toSeq
    assert(sessions == Seq((1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 1L)))
    val top = graft.operators.BehaviorOps
      .topKPerGroup(ev, Seq(col("user_id")), Seq(col("ts_us").desc), 1)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(top == Seq((1L, 2L), (2L, 3L)))
  }

  /** E9 end to end: source store -> reassemble -> transform -> target store
    * (Migrations/MigrateEventStore.cs:27-93 as one batch job). */
  test("migration pipeline: read, transform commits, write, re-read") {
    val srcDir = tmpDir()
    val dstDir = tmpDir()
    val schema = StructType(Seq(
      StructField("id", BinaryType), StructField("rev", IntegerType),
      StructField("ts", LongType),
      StructField("events", ArrayType(BinaryType)),
      StructField("publicEvents", ArrayType(BinaryType))))
    val commits = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("m1".getBytes, 1, 100L, Seq("a".getBytes), Seq.empty[Array[Byte]]),
        Row("m1".getBytes, 2, 200L, Seq("b".getBytes, "c".getBytes), Seq("p".getBytes)),
        Row("m2".getBytes, 1, 300L, Seq("d".getBytes), Seq.empty[Array[Byte]]))),
      schema)
    Storage.appendEvents(Storage.commitToRows(commits), s"$srcDir/events", nBuckets = 4)

    // migrate: bump every revision by 10 (a schema-evolution stand-in),
    // reassembled commits -> transformed -> rows -> target store
    val source = Storage.readEvents(spark, s"$srcDir/events")
    val migrated = EventStoreOps.migrate(source) { reassembled =>
      reassembled.withColumn("rev", col("rev") + 10)
    }
    val outRows = migrated.select(
      col("id"), col("rev").cast("int").as("rev"), col("ts"),
      col("events.data").as("events"),
      col("publicEvents.data").as("publicEvents"))
    Storage.appendEvents(Storage.commitToRows(outRows), s"$dstDir/events", nBuckets = 4)

    val back = EventStoreOps.reassembleCommits(
      Storage.readEvents(spark, s"$dstDir/events"))
    val got = back.collect().map(r => (
      new String(r.getAs[Array[Byte]]("id")), r.getAs[Int]("rev"),
      r.getSeq[Row](r.fieldIndex("events")).size,
      r.getSeq[Row](r.fieldIndex("publicEvents")).size)).toSet
    assert(got == Set(("m1", 11, 1, 0), ("m1", 12, 2, 1), ("m2", 11, 1, 0)))
  }
}
