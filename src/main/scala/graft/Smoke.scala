package graft

import org.apache.spark.sql.SparkSession

/** Simulates the driver's t1 smoke: a plain session (no graft-specific
  * configs — in particular no nanosAsLong flag) calling SparkEntry.entry;
  * prints the row count the driver checks for > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"SMOKE rows=${df.count()}")
    spark.stop()
  }
}
