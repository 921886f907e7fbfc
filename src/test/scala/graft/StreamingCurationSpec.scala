package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** Streaming curated landing: paragraphs are admitted corpus-wide exactly
  * once ACROSS micro-batches and ACROSS runs — the persisted paragraph-key
  * index carries the dedup frontier, so a paragraph admitted in run 1
  * blocks its recurrence in run 2 without re-reading run 1's text. */
class StreamingCurationSpec extends SparkSpec {

  test("curatedIngest admits each paragraph once across batches and runs") {
    import spark.implicits._
    val dir = tmpDir()
    val land = s"$dir/docs_in"; val out = s"$dir/curated"; val ckpt = s"$dir/ckpt"

    def run(): Unit = {
      val schema = spark.read.parquet(land).schema
      val src = spark.readStream.schema(schema).parquet(land)
      val q = StreamingOps.curatedIngest(src, out, ckpt, chunkSize = 4)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def landed() = spark.read.parquet(s"$out/docs").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))))
      .toMap

    // run 1: doc 1 = paragraphs P, Q; doc 2 repeats P in-batch and adds R
    Seq(
      (1L, "p1 p2 p3 p4 q1 q2 q3 q4"),
      (2L, "p1 p2 p3 p4 r1 r2 r3 r4")
    ).toDF("doc_id", "text").write.parquet(land)
    run()
    assert(landed() == Map(
      1L -> (("p1 p2 p3 p4 q1 q2 q3 q4", 2L, 0L)),
      2L -> (("r1 r2 r3 r4", 1L, 1L)))) // P lost to doc 1 inside the batch
    val idx1 = spark.read.parquet(s"$out/_para_index").distinct().count()
    assert(idx1 == 3) // P, Q, R admitted

    // run 2: doc 3 repeats Q (admitted LAST run — only the index knows)
    // and adds S; the checkpoint ensures run 1's files are not reprocessed
    Seq((3L, "q1 q2 q3 q4 s1 s2 s3 s4")).toDF("doc_id", "text")
      .write.mode("append").parquet(land)
    run()
    val all = landed()
    assert(all.keySet == Set(1L, 2L, 3L)) // no duplicate doc rows
    assert(all(3L) == (("s1 s2 s3 s4", 1L, 1L))) // Q blocked by the index
    assert(spark.read.parquet(s"$out/_para_index").distinct().count() == 4)
  }
}
