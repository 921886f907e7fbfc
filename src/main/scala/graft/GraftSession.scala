package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.plans.GraftFunctions

/** Session wiring for the engine.
  *
  * `GraftExtensions` is the standard SparkSessionExtensions entry point
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`); `GraftSession.prepare`
  * does the same on an already-built session (driver-owned sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineDescription)
    ext.injectFunction(graft.plans.IntersectionSize.description)
    ext.injectFunction(graft.plans.PolyFingerprint.description)
    ext.injectFunction(graft.plans.Fnv64.description)
    ext.injectFunction(graft.plans.BloomBuildAgg.description)
    ext.injectFunction(graft.plans.BloomMightContain.description)
    // derived-column pushdown: filters on ts_us (= floor(ts/1000)) gain
    // raw-nanos scan bounds — see plans.DerivedLongBounds
    ext.injectOptimizerRule(_ => graft.plans.DerivedLongBounds)
  }
}

object GraftSession {

  /** Settings a cluster deployment of this engine should run with. Local
    * test mains set master/shuffle-partitions explicitly; on a real
    * cluster these are the load-bearing knobs:
    *  - AQE on (runtime coalescing + skew-join splitting replaces manual
    *    salting for moderately skewed aggregates/event types),
    *  - partition sizes targeting ~128 MB parquet splits,
    *  - UTC + nanosAsLong for the event-log tables. */
  val clusterDefaults: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.compression.codec" -> "zstd",
  )

  /** Prepare an existing session (runtime-settable confs + functions +
    * optimizer rules — driver-owned sessions can't pass extensions at
    * build time, but `experimental.extraOptimizations` is live-settable
    * and runs after alias substitution has exposed division shapes). */
  def prepare(spark: SparkSession): SparkSession = {
    clusterDefaults.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf on live session
    }
    GraftFunctions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DerivedLongBounds))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DerivedLongBounds
    spark
  }
}
