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
  * PIN-AWARE: `Checkpoints.pin` is an eager localCheckpoint, so the
  * final plan starts AT the checkpoint and the audit would otherwise
  * never see what a pin already executed (an accidental cartesian inside
  * a pinned frame would sail through the "zero cartesians" invariant).
  * Every pinned subplan is therefore collected via
  * [[graft.operators.Checkpoints.observePins]] and counted alongside the
  * final plan (`pins=` reports how many subplans were folded in).
  *
  * Cartesians split into sanctioned / unsanctioned: the two
  * definition-truth cross products (the exact-arm policy — quadratic
  * truth runs only at the oracle SFs) are whitelisted BY NAME with their
  * expected count; anything else, anywhere, is unsanctioned and the row
  * is flagged.
  *
  * Usage: runMain graft.tools.PlanAudit q_index_join g_dedup_minhash ...
  * (no args = all queries; SPARK_GRAFT_SF_DIR overrides the fixture dir.)
  */
object PlanAudit {

  /** The policy-sanctioned definition-truth cross products, by query and
    * expected count: crossMaxCosine's exact decontamination arm
    * (SimilarityOps) and the bitext exact arm. A drift in the COUNT also
    * flags (a second accidental cartesian must not hide behind the
    * sanctioned first). */
  private val SanctionedCartesians: Map[String, Int] = Map(
    "g_decontam_semantic" -> 1,
    "g_bitext_margin" -> 1)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.prepare(spark)
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    var badRows = 0
    for (q <- names) {
      val pinned = scala.collection.mutable.ArrayBuffer.empty[String]
      val finalPlan = graft.operators.Checkpoints.observePins(p => pinned += p) {
        graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      }
      val plans = finalPlan +: pinned.toSeq
      def n(p: String) = plans.map(pl => p.r.findAllIn(pl).length).sum
      val cart = n("CartesianProduct")
      val sanctioned = math.min(cart, SanctionedCartesians.getOrElse(q, 0))
      val unsanctioned = cart - sanctioned
      if (unsanctioned > 0) badRows += 1
      println(s"PLAN $q exchanges=${n("Exchange")} broadcast=${n("BroadcastExchange")}" +
        s" cartesian=$cart sanctioned=$sanctioned unsanctioned=$unsanctioned" +
        s" bnlj=${n("BroadcastNestedLoopJoin")} sortmerge=${n("SortMergeJoin")}" +
        s" pins=${pinned.size}")
    }
    println(s"AUDIT unsanctioned_cartesian_rows=$badRows")
    spark.stop()
  }
}
