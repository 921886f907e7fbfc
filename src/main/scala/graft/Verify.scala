package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b runs (and emits
    // oracles for) just those queries. Unset for the driver's full run.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators persist intermediates (LSH signatures etc.); don't let
      // 40+ queries' caches accumulate in one session
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // a filtered run must NOT overwrite a full run's manifest: stale
    // per-query parquet dirs from an earlier full dump would then be
    // silently skipped by the checker and read as a green full verify
    val manifest =
      if (only.isDefined) s"$outDir/oracle_sql.partial.json" else s"$outDir/oracle_sql.json"
    if (only.isEmpty) // a full run supersedes any stale subset manifest
      Files.deleteIfExists(Paths.get(s"$outDir/oracle_sql.partial.json")): Unit
    // the partial manifest records WHICH subset produced it, so check.py
    // can refuse a stale partial from a different SPARK_GRAFT_ONLY value
    // (the full manifest keeps the driver's flat format)
    val body =
      if (only.isDefined)
        s"""{"only": ${q(sys.env("SPARK_GRAFT_ONLY"))}, "oracles": $json}"""
      else json
    Files.writeString(Paths.get(manifest), body)
    // sidecar (NOT part of the driver-consumed manifest format): how many
    // queries SparkEntry declares in total, so check.py can report
    // "checked N of M declared" and a subset run can never read as full
    Files.writeString(Paths.get(s"$outDir/declared_count.json"),
      s"""{"declared": ${SparkEntry.oracleSql.size}}""")
    if (only.isDefined)
      System.err.println(s"[verify] SPARK_GRAFT_ONLY set: manifest written to $manifest")
    spark.stop()
  }
}
