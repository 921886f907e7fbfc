package graft

import org.apache.spark.sql.functions._
import graft.sources.Storage

/** Streaming-sink compaction: per-append small files fold to one file per
  * partition directory, the readback is identical, and the partition
  * scheme's directory pruning survives the rewrite. */
class CompactionSpec extends SparkSpec {

  private def parquetFilesPerDir(root: String): Map[String, Int] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      d.listFiles().toSeq.flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .groupBy(_.getParentFile.getPath.stripPrefix(root)).map { case (k, v) => k -> v.size }
  }

  test("compactIndex folds per-append files, preserves rows and pruning") {
    import spark.implicits._
    val dir = tmpDir()
    val idx = s"$dir/index"; val out = s"$dir/index_c"
    def rows(tsBase: Long) = Seq(
      ("click", 2026001, "a1", 1, 0, tsBase),
      ("click", 2026002, "a2", 1, 0, tsBase + 1),
      ("view", 2026001, "a3", 1, 0, tsBase + 2)
    ).toDF("et", "pid", "aid", "rev", "pos", "ts")
    // three appends = three files per touched directory
    Storage.appendIndex(rows(100L), idx)
    Storage.appendIndex(rows(200L), idx)
    Storage.appendIndex(rows(300L), idx)
    assert(parquetFilesPerDir(idx).values.forall(_ == 3))

    Storage.compactIndex(spark, idx, out)
    assert(parquetFilesPerDir(out).values.forall(_ == 1))
    val key = Seq("et", "pid", "aid", "rev", "pos", "ts")
    assert(
      spark.read.parquet(out).select(key.map(col): _*).collect().toSet ==
        spark.read.parquet(idx).select(key.map(col): _*).collect().toSet)
    // directory pruning preserved on the compacted layout
    val probe = spark.read.parquet(out).filter(col("et") === "click" && col("pid") === 2026001)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pid"), s"no pruning:\n$plan")
    val probed = probe.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty && probed.forall(f => f.contains("et=click") && f.contains("pid=2026001")))
  }

  test("compactMessages folds the date-partitioned layout") {
    import spark.implicits._
    val dir = tmpDir()
    val msgs = s"$dir/messages"; val out = s"$dir/messages_c"
    val day = Storage.DayTicks
    def batch(o: Long) = Seq((1L, day + o), (2L, 2 * day + o)).toDF("mid", "ts")
    Storage.appendMessages(batch(10L), msgs)
    Storage.appendMessages(batch(20L), msgs)
    assert(parquetFilesPerDir(msgs).values.forall(_ == 2))
    Storage.compactMessages(spark, msgs, out)
    assert(parquetFilesPerDir(out).values.forall(_ == 1))
    assert(
      spark.read.parquet(out).select("mid", "ts", "date").collect().toSet ==
        spark.read.parquet(msgs).select("mid", "ts", "date").collect().toSet)
  }
}
