package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.operators.MultimodalOps
import graft.streaming.StreamingOps

/** Streaming content-addressed chunk-store ingest: per-batch novel-only
  * chunk landings + recipes in batch-id-derived directories, byte-exact
  * reassembly across levels, replay idempotence, parameter-drift
  * refusal, lineage guard, and compaction with newest-delta protection.
  * The single-batch oracle row is q_stream_store. */
class ChunkStoreStreamSpec extends SparkSpec {

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = spark.createDataFrame(
    scala.jdk.CollectionConverters.SeqHasAsJava(
      rows.map { case (i, b) => org.apache.spark.sql.Row(i, b) }).asJava,
    StructType(Seq(StructField("media_id", LongType), StructField("content", BinaryType))))

  private val base = Array.tabulate(400)(i => ((i * 73 + 19) % 256).toByte)
  private val prefixedDup = Array[Byte](9, -3, 0) ++ base
  private val other = base.map(b => (b ^ 0x55).toByte)

  private def readBack(path: String) = MultimodalOps.readChunkStore(spark, path)
    .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap

  test("cross-batch novel-only dedup; byte-exact reassembly; replay overwrites") {
    val path = s"${tmpDir()}/store"
    StreamingOps.storeBatch(mediaOf(Seq(1L -> base)), 0L, path, 5, 4, "media_id", "content")
    val level0 = spark.read.parquet(s"$path/chunks/__batch=0").count()
    StreamingOps.storeBatch(mediaOf(Seq(2L -> prefixedDup, 3L -> other)), 1L,
      path, 5, 4, "media_id", "content")
    val level1 = spark.read.parquet(s"$path/chunks/__batch=1").count()
    // the prefixed dup's shared chunks were already stored by batch 0 —
    // level 1 holds (roughly) only payload 3's novel content + the prefix
    assert(level1 < level0 * 2, s"no cross-batch dedup: $level0 then $level1")
    // no address is stored twice across levels
    val all = spark.read.schema("addr STRING, chunk_bytes BINARY")
      .parquet(s"$path/chunks/__batch=0", s"$path/chunks/__batch=1")
    assert(all.count() == all.select("addr").distinct().count())
    val expect = Map(1L -> base.toSeq, 2L -> prefixedDup.toSeq, 3L -> other.toSeq)
    assert(readBack(path) == expect)
    // checkpoint replay of the newest batch: identical state, no duplicates
    StreamingOps.storeBatch(mediaOf(Seq(2L -> prefixedDup, 3L -> other)), 1L,
      path, 5, 4, "media_id", "content")
    assert(readBack(path) == expect)
    assert(spark.read.parquet(s"$path/chunks/__batch=1").count() == level1)
  }

  test("parameter drift and foreign lineage are refused") {
    val path = s"${tmpDir()}/store"
    StreamingOps.storeBatch(mediaOf(Seq(1L -> base)), 3L, path, 5, 4, "media_id", "content")
    val drift = intercept[IllegalArgumentException] {
      StreamingOps.storeBatch(mediaOf(Seq(2L -> other)), 4L, path, 8, 16, "media_id", "content")
    }
    assert(drift.getMessage.contains("parameters disagree"))
    val lineage = intercept[IllegalArgumentException] {
      StreamingOps.storeBatch(mediaOf(Seq(2L -> other)), 0L, path, 5, 4, "media_id", "content")
    }
    assert(lineage.getMessage.contains("different checkpoint lineage"))
  }

  test("batch append/GC refuse a streamed (leveled) store") {
    import spark.implicits._
    val path = s"${tmpDir()}/store"
    StreamingOps.storeBatch(mediaOf(Seq(1L -> base)), 0L, path, 5, 4, "media_id", "content")
    val e1 = intercept[IllegalArgumentException] {
      MultimodalOps.appendToChunkStore(mediaOf(Seq(2L -> other)), path, w = 5, divisor = 4)
    }
    assert(e1.getMessage.contains("STREAMED chunk store"))
    val e2 = intercept[IllegalArgumentException] {
      MultimodalOps.deleteFromChunkStore(spark, path, Seq(1L).toDF("media_id"))
    }
    assert(e2.getMessage.contains("STREAMED chunk store"))
  }

  test("compactChunkStore folds committed levels, protects the newest, keeps reassembly") {
    val path = s"${tmpDir()}/store"
    StreamingOps.storeBatch(mediaOf(Seq(1L -> base)), 0L, path, 5, 4, "media_id", "content")
    StreamingOps.storeBatch(mediaOf(Seq(2L -> prefixedDup)), 1L, path, 5, 4, "media_id", "content")
    StreamingOps.storeBatch(mediaOf(Seq(3L -> other)), 2L, path, 5, 4, "media_id", "content")
    val before = readBack(path)
    StreamingOps.compactChunkStore(spark, path)
    def dirs(side: String) = new java.io.File(s"$path/$side").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).toSeq.sorted
    assert(dirs("chunks") == Seq("__batch=-1", "__batch=2"))
    assert(dirs("recipes") == Seq("__batch=-1", "__batch=2"))
    assert(readBack(path) == before)
    // the protected newest replays onto its own directories after the fold
    StreamingOps.storeBatch(mediaOf(Seq(3L -> other)), 2L, path, 5, 4, "media_id", "content")
    assert(readBack(path) == before)
  }

  test("hide window: a batch over a crashed chunks fold heals it, stores no duplicate addr") {
    val path = s"${tmpDir()}/store"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    StreamingOps.storeBatch(mediaOf(Seq(1L -> base)), 0L, path, 5, 4, "media_id", "content")
    StreamingOps.storeBatch(mediaOf(Seq(3L -> other)), 1L, path, 5, 4, "media_id", "content")
    StreamingOps.compactChunkStore(spark, path)
    // crash between base->retired and staging->base on the chunks side:
    // payload 1's addresses are visible only inside the leftover
    require(fs.rename(p(s"$path/chunks/__batch=-1"), p(s"$path/chunks/_retired")))
    // payload 2 shares payload 1's chunks; without the heal the anti-join
    // misses the hidden history and re-stores them as "novel" — duplicate
    // addr rows that persist past the fold's own recovery
    StreamingOps.storeBatch(mediaOf(Seq(2L -> prefixedDup)), 2L,
      path, 5, 4, "media_id", "content")
    val all = spark.read.schema("addr STRING, chunk_bytes BINARY")
      .option("basePath", s"$path/chunks").parquet(s"$path/chunks")
    assert(all.count() == all.select("addr").distinct().count(),
      "hidden base was not healed — duplicate chunk addresses stored")
    assert(!fs.exists(p(s"$path/chunks/_retired")) &&
      !fs.exists(p(s"$path/chunks/_compacting")))
    assert(readBack(path) ==
      Map(1L -> base.toSeq, 2L -> prefixedDup.toSeq, 3L -> other.toSeq))
  }
}
