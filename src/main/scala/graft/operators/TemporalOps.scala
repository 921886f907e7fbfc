package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference's replay consumers end up writing
  * by hand (correlate each event with the latest earlier state / find events
  * near an anchor). Spark has no ASOF or interval join operator, so both are
  * expressed as shuffle-friendly compositions that avoid the O(|L|x|R|)
  * blow-up a naive join condition would produce at 100 TB.
  */
object TemporalOps {

  /** As-of join: for every probe row, attach the latest reference row with
    * `ref.ts <= probe.ts` for the same key (LEFT semantics: probes with no
    * earlier reference keep nulls).
    *
    * Implementation: union the two tagged streams, one window per key
    * ordered by (ts, isRef DESC) — at equal ts the reference sorts first,
    * giving inclusive at-or-before semantics — and carry the last non-null
    * reference payload forward. Exactly ONE shuffle on the key, |P|+|R|
    * rows total, no join explosion; this is the plan a 1000-executor
    * cluster wants (a range/inequality join would either cross-product or
    * single-partition sort).
    *
    * Reference rows must be unique per (key, ts) — pre-reduce the reference
    * side first (e.g. max payload per key+ts); ties are otherwise
    * nondeterministic under shuffle.
    *
    * Hot-key skew: one key = one window partition = one task (AQE splits
    * skewed JOIN partitions, not window partitions), so a key holding a
    * large share of both streams serializes on one core. Correctness is
    * unaffected (SkewSpec pins a 90%-hot-key run); if one key's rows
    * exceed a task's comfort zone, split the window by time-chunk and
    * carry each chunk's last reference into the next (the two-phase
    * carry shape of CurationOps.tokenPacking).
    *
    * @param refPayload reference columns to expose (each becomes
    *                   `asof_<name>` on the output)
    */
  def asOfJoin(
      probe: DataFrame,
      ref: DataFrame,
      keyCol: String,
      tsCol: String,
      refPayload: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val refStructT = ref.select(struct(refPayload.map(col): _*).as("r")).schema("r").dataType
    val probeStructT = probe.select(struct(probeCols.map(col): _*).as("p")).schema("p").dataType
    val pSide = probe.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(false).as("__is_ref"),
      struct(probeCols.map(col): _*).as("__p"),
      lit(null).cast(refStructT).as("__r"))
    val rSide = ref.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(true).as("__is_ref"),
      lit(null).cast(probeStructT).as("__p"),
      struct(refPayload.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pSide.unionByName(rSide)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(!col("__is_ref"))
      .select(
        probeCols.map(c => col(s"__p.$c").as(c)) ++
          refPayload.map(c => col(s"__last_r.$c").as(s"asof_$c")): _*)
  }

  /** Skew-proof as-of join: identical semantics to `asOfJoin`, but each
    * key's timeline is split into fixed-width TIME CHUNKS so a hot key
    * spreads over (key span / chunkWidth) tasks — the same two-phase carry
    * shape as BehaviorOps.sessionizeChunked:
    *
    *  1. window per (key, chunk): chunk-local carry-forward of the last
    *     reference;
    *  2. per-(key, chunk) last-reference aggregate (a TINY frame) + one
    *     per-key window over it for the latest reference of PRECEDING
    *     chunks;
    *  3. a probe's match = its chunk-local last reference, else the
    *     carried one (the carried reference's true ts is below the chunk
    *     start, so an equal-ts in-chunk reference correctly wins).
    *
    * Probes in chunks with no reference rows are covered because the
    * carry is computed over every (key, chunk) present in the UNION. */
  def asOfJoinChunked(
      probe: DataFrame,
      ref: DataFrame,
      keyCol: String,
      tsCol: String,
      refPayload: Seq[String],
      chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    val probeCols = probe.columns.toSeq
    val refStructT = ref.select(struct(refPayload.map(col): _*).as("r")).schema("r").dataType
    val probeStructT = probe.select(struct(probeCols.map(col): _*).as("p")).schema("p").dataType
    val pSide = probe.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(false).as("__is_ref"),
      struct(probeCols.map(col): _*).as("__p"),
      lit(null).cast(refStructT).as("__r"))
    val rSide = ref.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(true).as("__is_ref"),
      lit(null).cast(probeStructT).as("__p"),
      struct(refPayload.map(col): _*).as("__r"))
    val u = pSide.unionByName(rSide)
      // floor division (not DIV, which truncates toward zero) keeps chunks
      // uniform across ts=0 for negative timestamps
      .withColumn("__cid", graft.functions.TimeFns.ldiv(col("__t"), chunkWidth))
    val wLocal = Window.partitionBy(col("__k"), col("__cid"))
      .orderBy(col("__t"), col("__is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // phase 2 frame: latest reference per (key, chunk) — struct max is
    // lexicographic on (__t, ...), and refs are unique per (key, ts)
    val wChunks = Window.partitionBy(col("__sk")).orderBy(col("__sc"))
    val stats = u.groupBy(col("__k").as("__sk"), col("__cid").as("__sc"))
      .agg(max(when(col("__is_ref"), struct(col("__t"), col("__r")))).as("__chunk_last"))
      .withColumn("__carry",
        last(col("__chunk_last"), ignoreNulls = true)
          .over(wChunks.rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__sk"), col("__sc"), col("__carry").getField("__r").as("__carry_r"))
    u.join(stats, col("__k") === col("__sk") && col("__cid") === col("__sc"))
      .withColumn("__last_r",
        coalesce(last(col("__r"), ignoreNulls = true).over(wLocal), col("__carry_r")))
      .filter(!col("__is_ref"))
      .select(
        probeCols.map(c => col(s"__p.$c").as(c)) ++
          refPayload.map(c => col(s"__last_r.$c").as(s"asof_$c")): _*)
  }

  /** Interval-point range join: rows of `points` whose `tCol` falls inside
    * `[loCol, hiCol]` of an `intervals` row with the same key.
    *
    * Spark has no inequality-join operator that scales (a theta join is a
    * broadcast nested loop), so the time axis is bucketized: every point
    * belongs to exactly one bucket of `bucketWidth`; every interval explodes
    * to the buckets it covers (ceil(len/width)+1 of them); the join is then
    * a plain equi-join on (key, bucket) + an exact range filter. Each point
    * matches each interval at most once (its single bucket), so no dedup is
    * needed. Choose bucketWidth ~ the typical interval length: wider wastes
    * filter work, narrower multiplies the exploded interval rows.
    *
    * Output: all interval columns + all point columns (caller ensures
    * disjoint names).
    */
  def rangeJoin(
      intervals: DataFrame,
      points: DataFrame,
      keyCol: String,
      loCol: String,
      hiCol: String,
      tCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // integer DIV, not floating /: exact for the full long range
    val pts = points.withColumn("__b", expr(s"`$tCol` DIV ${bucketWidth}L"))
    val loB = expr(s"`$loCol` DIV ${bucketWidth}L")
    val hiB = expr(s"`$hiCol` DIV ${bucketWidth}L")
    // Guard before exploding: an interval that is huge relative to
    // bucketWidth (bad caller width, corrupt lo/hi) would otherwise emit
    // millions of bucket rows per input row — or hit sequence()'s element
    // cap — as a silent OOM. Fail loudly, per row, with the bad span.
    // (A filter condition is never pruned, unlike an unused projection.)
    val badSpanMsg = concat(
      lit(s"rangeJoin: interval spans >= $maxBucketsPerInterval buckets of $bucketWidth "),
      col(loCol), lit(".."), col(hiCol),
      lit(" - widen bucketWidth or fix the data"))
    val spanOk = when(hiB - loB < lit(maxBucketsPerInterval), lit(true))
      .otherwise(raise_error(badSpanMsg).cast("boolean"))
    val guarded = intervals.filter(spanOk)
    val ivs = guarded.withColumn("__b", explode(sequence(loB, hiB)))
    ivs.join(pts, Seq(keyCol, "__b"))
      .filter(col(tCol).between(col(loCol), col(hiCol)))
      .drop("__b")
  }
}
