package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering for scan pruning — the Z-order layout
  * pass (the OPTIMIZE ZORDER analogue of Delta/Iceberg, expressed with
  * plain Spark: an interleaved-bit sort key + repartitionByRange).
  *
  * Why it matters at 100 TB: parquet row-group skipping prunes on
  * column min/max. A layout sorted on ONE column gives tight stats for
  * that column only — a filter on any other column reads everything. A
  * single partitionBy(a)/partitionBy(a,b) directory layout explodes into
  * tiny files when both dimensions are high-cardinality. Interleaving the
  * bits of both (quantized) dimensions into one sort key makes every file
  * a near-cube in (a, b) space: min/max stays tight on BOTH columns, so a
  * predicate box on either — or both — prunes most files AND most row
  * groups, with file count under the writer's control, not the key
  * cardinality's.
  *
  * The z-value is ordinary codegen bit arithmetic (shiftright/and/or) on
  * the two quantized dimensions; the write is one range shuffle, the same
  * cost as any global sort of the same data. Nothing here is driver-side.
  */
object Layout {

  /** Interleave the low `bits` of two non-negative longs: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Pure codegen arithmetic
    * (no UDF); 2*bits <= 62 keeps the key in a positive long.
    *
    * QUANTIZATION CONTRACT: only the low `bits` of each input
    * participate — values differing solely in higher bits alias to the
    * same z-key. That never affects correctness (readers filter the
    * natural columns, not the key) but silently degrades clustering and
    * therefore pruning, so quantize skewed/huge-domain columns BEFORE
    * interleaving (day number, id div blockSize, ...) and size `bits` to
    * the quantized domain. Pass `strict = true` in layout-validation jobs
    * to fail loudly on any out-of-domain input instead of aliasing. */
  def zValue(a: Column, b: Column, bits: Int = 16, strict: Boolean = false): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    def checked(c: Column): Column =
      if (!strict) c
      else when(c >= 0 && c < (1L << bits), c).otherwise(raise_error(concat(
        lit(s"Layout.zValue: input outside [0, 2^$bits): "), c.cast("string"))))
    val (ac, bc) = (checked(a), checked(b))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(ac, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered on (aCol, bCol): range-partition on the
    * interleaved key into `nFiles` near-equal ranges (sampled split
    * points — handles skew the way any global sort does), sort within
    * each, one file per range. The z column itself is dropped: the layout
    * IS the index, readers just filter on the natural columns. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      aCol: String,
      bCol: String,
      bits: Int = 16,
      nFiles: Int = 32): Unit =
    df.withColumn("__z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.ErrorIfExists).parquet(path)

  /** Footer-stats audit: of the data files under `path`, how many could
    * contain rows with `colName` in [lo, hi] by their parquet row-group
    * min/max — i.e. what a stats-pruning reader must actually open. The
    * driver lists footers only (metadata reads, no data I/O) — this is an
    * audit/ops helper, not a query path. */
  def candidateFiles(
      spark: SparkSession, path: String, colName: String, lo: Long, hi: Long): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet"))
    val hits = files.count { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.asScala.exists { block =>
          block.getColumns.asScala.find(_.getPath.toDotString == colName).exists { c =>
            val st = c.getStatistics
            if (st == null || !st.hasNonNullValue) true // no stats -> must read
            else {
              val mn = st.genericGetMin.asInstanceOf[Number].longValue()
              val mx = st.genericGetMax.asInstanceOf[Number].longValue()
              mx >= lo && mn <= hi
            }
          }
        }
      } finally reader.close()
    }
    (hits, files.length)
  }
}
