package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Generations
import graft.streaming.StreamingOps

/** Round-9 verdict #2: streaming ingest composed with the Generations MVCC
  * layer. A live ingestToVersioned stream and a concurrent
  * deleteAndPromote on the same table must BOTH land (each commit is a
  * manifest CAS; losers retry from fresh state), and checkpoint restarts
  * must not double-land a processed file. */
class StreamingGenerationsSpec extends SparkSpec {

  private def mkRows(ids: Seq[String], revs: Range): DataFrame = {
    import spark.implicits._
    ids.flatMap(id => revs.map(r => (id, r))).toDF("ids", "rev")
      .select(col("ids").cast("binary").as("id"), col("rev"),
        lit(0).as("pos"), lit(1L).as("ts"), lit("d".getBytes).as("data"))
  }

  test("ingestToVersioned lands waves across restarts; a racing deleteAndPromote also lands") {
    import java.util.concurrent.{Executors, TimeUnit}
    val dir = tmpDir()
    val land = s"$dir/landing"; val root = s"$dir/events"; val ckpt = s"$dir/ckpt"

    // wave 1 arrives in the landing zone and streams into the versioned table
    mkRows(Seq("a", "b"), 1 to 3).write.parquet(land)
    val schema = spark.read.parquet(land).schema
    def runStream(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // several micro-batches = several promotes
        .parquet(land)
      val q = StreamingOps.ingestToVersioned(src, root, ckpt, nBuckets = 4)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runStream()
    val v1 = Generations.currentVersion(spark, root)
    assert(v1 >= 1)
    assert(Generations.readCurrent(spark, root).count() == 6)

    // wave 2 arrives; the stream restarts from its checkpoint WHILE a
    // concurrent writer deletes (a, rev 1) — both race the manifest CAS
    mkRows(Seq("c", "d"), 1 to 3).write.mode("append").parquet(land)
    val pool = Executors.newFixedThreadPool(2)
    val fStream = pool.submit(new Runnable { def run(): Unit = runStream() })
    val fDelete = pool.submit(new java.util.concurrent.Callable[Option[String]] {
      def call(): Option[String] = Generations.withConflictRetry(maxAttempts = 10) {
        Generations.deleteAndPromote(spark, root,
          mkRows(Seq("a"), 1 to 1).select("id", "rev", "pos"), nBuckets = 4)
      }
    })
    fStream.get(300, TimeUnit.SECONDS)
    val deleted = fDelete.get(300, TimeUnit.SECONDS)
    pool.shutdown()
    assert(deleted.nonEmpty) // the delete found its rows and promoted

    // serializability: BOTH the stream's appends and the delete landed —
    // wave1 + wave2 minus the tombstoned row, nothing double-landed
    val cur = Generations.readCurrent(spark, root)
    assert(cur.count() == 11)
    assert(cur.filter(col("id") === lit("a".getBytes) && col("rev") === 1).count() == 0)
    assert(cur.filter(col("id") === lit("c".getBytes)).count() == 3)
    assert(cur.groupBy(col("id"), col("rev"), col("pos")).count()
      .filter(col("count") > 1).count() == 0)

    // a further restart with no new files is a no-op (checkpoint exactness)
    val vBefore = Generations.currentVersion(spark, root)
    runStream()
    assert(Generations.currentVersion(spark, root) == vBefore)
    assert(Generations.readCurrent(spark, root).count() == 11)
  }
}
