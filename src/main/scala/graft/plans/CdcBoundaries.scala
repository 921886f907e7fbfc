package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Content-defined chunk boundaries over a BINARY payload as one native
  * codegen'd pass — the byte-level CDC primitive for multimodal dedup
  * (images/audio/video are opaque binary columns here; CDC is the dedup
  * that survives re-muxed/prepended containers, the rsync/LBFS rule).
  *
  * Returns the array of positions `p` (0-based, ascending) where the
  * polynomial fingerprint `(acc*31 + byte) mod 1e9+7` of the w-byte
  * window STARTING at `p` divides `divisor`, for `0 < p <= len - w` —
  * each such position starts a new chunk; chunk 0 always starts at 0.
  * The window hash is maintained as a true ROLLING hash (subtract the
  * outgoing byte's `31^(w-1)` term, shift, add the incoming byte — all
  * mod p, every intermediate below 2^51), so the pass is O(n) regardless
  * of w, where the per-position recompute the SQL oracle uses is O(n·w)
  * — identical values, verification-scale only.
  *
  * On ASCII payloads the byte fold equals the code-point fold, which is
  * how the DuckDB oracle replays it over the text corpus
  * (the g_multimodal_decode byte==codepoint precedent); real binary
  * simply has no oracle-side replay and is gated by the driver-reference
  * spec instead.
  */
case class CdcBoundaries(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {

  require(w >= 1 && divisor >= 1, "w and divisor must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_boundaries"

  private val P = 1000000007L

  /** 31^(w-1) mod p — the outgoing byte's positional weight. */
  private lazy val topWeight: Long = {
    var r = 1L
    var i = 1
    while (i < w) { r = r * 31L % P; i += 1 }
    r
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n < w) return new GenericArrayData(Array.empty[Int])
    val buf = new Array[Int](n)
    var cnt = 0
    var h = 0L
    var j = 0
    while (j < w) { h = (h * 31L + (bytes(j) & 0xFF)) % P; j += 1 }
    var p = 0
    while (p + w <= n) {
      if (p > 0 && h % divisor == 0) { buf(cnt) = p; cnt += 1 }
      if (p + w < n) {
        val out = (bytes(p) & 0xFF) * topWeight % P
        h = ((h - out + P) % P * 31L + (bytes(p + w) & 0xFF)) % P
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // all locals fresh-named; no parenthesized expression before `<<`
      // (the Utf8CodePoints Janino constraints — CodegenCompileSpec pins
      // this kernel compiles under GenerateUnsafeProjection)
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val outv = ctx.freshName("outv")
      s"""
         |int $n = $c.length;
         |int[] $buf = new int[$n > 0 ? $n : 1];
         |int $cnt = 0;
         |if ($n >= $w) {
         |  long $h = 0L;
         |  for (int $j = 0; $j < $w; $j++) {
         |    $h = ($h * 31L + ($c[$j] & 0xFF)) % 1000000007L;
         |  }
         |  int $p = 0;
         |  while ($p + $w <= $n) {
         |    if ($p > 0 && $h % ${divisor}L == 0L) { $buf[$cnt] = $p; $cnt++; }
         |    if ($p + $w < $n) {
         |      long $outv = ($c[$p] & 0xFF) * ${topWeight}L % 1000000007L;
         |      $h = (($h - $outv + 1000000007L) % 1000000007L * 31L + ($c[$p + $w] & 0xFF)) % 1000000007L;
         |    }
         |    $p++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {

  val Name = "graft_cdc_boundaries"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[CdcBoundaries].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 3, s"$Name expects (binary, w, divisor)")
      def intLit(e: Expression, name: String): Int = {
        require(e.foldable, s"$Name: $name must be a literal")
        e.eval().asInstanceOf[Number].intValue()
      }
      CdcBoundaries(Cast(children.head, BinaryType),
        intLit(children(1), "w"), intLit(children(2), "divisor"))
    })
}
