package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Model
import graft.operators.EventStoreOps
import graft.sources.Storage

/** Semantics-parity tests mirroring the reference's integration fixtures
  * (/root/reference/src/One.Inception.EventStore.Cassandra.Integration.Tests/
  * CassandraEventStoreTests.cs): append/load round trip, pos-offset
  * public/private split, paged loads, deletes. */
class EventStoreOpsSpec extends SparkSpec {

  def bin(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** One commit fixture like CassandraEventStoreTests.cs:120-134: one
    * private + one public event => pos 0 and 5. */
  def commitsDf(): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", BinaryType), StructField("rev", IntegerType),
      StructField("ts", LongType),
      StructField("events", ArrayType(BinaryType)),
      StructField("publicEvents", ArrayType(BinaryType))))
    val rows = Seq(
      Row(bin("agg-1"), 1, 1000L, Seq(bin("e1")), Seq(bin("p1"))),
      Row(bin("agg-1"), 2, 2000L, Seq(bin("e2"), bin("e3")), Seq.empty[Array[Byte]]),
      Row(bin("agg-2"), 1, 1500L, Seq(bin("x1")), Seq(bin("px1"), bin("px2"))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("commitToRows writes pos 0 and 5 for one private + one public event") {
    val rows = Storage.commitToRows(commitsDf())
      .filter(col("rev") === 1)
      .collect()
      .filter(r => new String(r.getAs[Array[Byte]]("id")) == "agg-1")
      .map(r => (r.getAs[Int]("pos"), new String(r.getAs[Array[Byte]]("data"))))
      .sortBy(_._1)
    // reference asserts exactly positions 0 and n-1+5+0 = 5
    assert(rows.toSeq == Seq((0, "e1"), (5, "p1")))
  }

  test("append then reassemble is identity on commits (round trip)") {
    val rows = Storage.commitToRows(commitsDf())
    val back = EventStoreOps.reassembleCommits(rows).collect()
    assert(back.length == 3)
    val c1 = back.find(r => new String(r.getAs[Array[Byte]]("id")) == "agg-1"
      && r.getAs[Int]("rev") == 1).get
    def datas(r: Row, field: String): Seq[String] =
      r.getSeq[Row](r.fieldIndex(field)).map(e => new String(e.getAs[Array[Byte]]("data"))).toSeq
    assert(datas(c1, "events") == Seq("e1") && datas(c1, "publicEvents") == Seq("p1"))
    val c2 = back.find(r => new String(r.getAs[Array[Byte]]("id")) == "agg-2").get
    assert(datas(c2, "events").size == 1)
    assert(datas(c2, "publicEvents").size == 2) // pos 5,6 -> public
    assert(c2.getAs[Long]("ts") == 1500L)
  }

  test("reassembly is invariant under row shuffling") {
    val rows = Storage.commitToRows(commitsDf()).orderBy(rand(seed = 7))
    val back = EventStoreOps.reassembleCommits(rows)
      .select(col("rev"), size(col("events")), size(col("publicEvents")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(back == Seq((1, 1, 1), (1, 1, 2), (2, 2, 0)))
  }

  test("loadAggregateEvents returns one aggregate in clustering order") {
    val rows = Storage.commitToRows(commitsDf())
    val got = EventStoreOps.loadAggregateEvents(rows, lit(bin("agg-1")))
      .collect().map(r => (r.getAs[Int]("rev"), r.getAs[Int]("pos"))).toSeq
    assert(got == Seq((1, 0), (1, 5), (2, 0), (2, 1)))
  }

  test("loadAggregateEventsDesc reverses the order") {
    val rows = Storage.commitToRows(commitsDf())
    val got = EventStoreOps.loadAggregateEventsDesc(rows, lit(bin("agg-1")))
      .collect().map(r => (r.getAs[Int]("rev"), r.getAs[Int]("pos"))).toSeq
    assert(got == Seq((2, 1), (2, 0), (1, 5), (1, 0)))
  }

  test("keyset paging covers the partition without overlap") {
    val rows = Storage.commitToRows(commitsDf())
    val p1 = EventStoreOps.loadWithPaging(rows, lit(bin("agg-1")), None, take = 3)
      .collect().map(r => (r.getAs[Int]("rev"), r.getAs[Int]("pos"))).toSeq
    assert(p1 == Seq((1, 0), (1, 5), (2, 0)))
    val p2 = EventStoreOps.loadWithPaging(rows, lit(bin("agg-1")), Some(p1.last), take = 3)
      .collect().map(r => (r.getAs[Int]("rev"), r.getAs[Int]("pos"))).toSeq
    assert(p2 == Seq((2, 1)))
  }

  test("keyset paging pages backwards (B4 order) as well") {
    val rows = Storage.commitToRows(commitsDf())
    val p1 = EventStoreOps.loadWithPaging(rows, lit(bin("agg-1")), None, take = 3, ascending = false)
      .collect().map(r => (r.getAs[Int]("rev"), r.getAs[Int]("pos"))).toSeq
    assert(p1 == Seq((2, 1), (2, 0), (1, 5)))
    val p2 = EventStoreOps.loadWithPaging(rows, lit(bin("agg-1")), Some(p1.last), take = 3, ascending = false)
      .collect().map(r => (r.getAs[Int]("rev"), r.getAs[Int]("pos"))).toSeq
    assert(p2 == Seq((1, 0)))
  }

  test("point delete removes exactly the tombstoned row") {
    val rows = Storage.commitToRows(commitsDf())
    val tomb = rows.filter(
        col("id") === lit(bin("agg-1")) && col("rev") === 1 && col("pos") === 5)
      .select("id", "rev", "pos")
    val left = Storage.deleteEvents(rows, tomb)
    assert(rows.count() == 7 && left.count() == 6)
    assert(left.filter(col("id") === lit(bin("agg-1")) && col("pos") === 5).count() == 0)
  }

  test("appendEvents/readEvents round trip preserves rows and buckets by id") {
    val dir = tmpDir()
    val rows = Storage.commitToRows(commitsDf())
    Storage.appendEvents(rows, s"$dir/events", nBuckets = 4)
    val back = Storage.readEvents(spark, s"$dir/events")
    assert(back.count() == 7)
    // all rows of one aggregate land in exactly one bucket
    val buckets = back.filter(col("id") === lit(bin("agg-1")))
      .select("bucket").distinct().count()
    assert(buckets == 1)
  }

  test("enumerateEventStore dispatches between full scan and index branch") {
    val rows = Storage.commitToRows(commitsDf()).withColumn("et",
      when(col("pos") >= Model.PublicEventsOffset, "public").otherwise("private"))
    val idx = graft.operators.IndexOps.buildIndex(rows)
    val full = EventStoreOps.enumerateEventStore(rows, idx, None, 0L, Long.MaxValue / 2)
    assert(full.count() == 7)
    val publicOnly = EventStoreOps.enumerateEventStore(
      rows, idx, Some("public"), 0L, Long.MaxValue / 2)
    assert(publicOnly.count() == 3) // pos 5, 5, 6
  }
}
