package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit over named SparkEntry queries: prints the exchange /
  * broadcast / cartesian / nested-loop / sort-merge counts of each
  * executed plan — the quick scale-smell check (a CartesianProduct or an
  * unexpected SortMergeJoin where a broadcast was intended shows up as a
  * count, without reading full explain output). [[ExplainAudit]] is the
  * companion that prints the full formatted plans once a count here
  * looks wrong.
  *
  * Usage: runMain graft.tools.PlanAudit q_index_join g_dedup_minhash ...
  * (no args = all queries; SPARK_GRAFT_SF_DIR overrides the fixture dir.)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.prepare(spark)
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).length
      println(s"PLAN $q exchanges=${n("Exchange")} broadcast=${n("BroadcastExchange")}" +
        s" cartesian=${n("CartesianProduct")} bnlj=${n("BroadcastNestedLoopJoin")}" +
        s" sortmerge=${n("SortMergeJoin")}")
    }
    spark.stop()
  }
}
