package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual hash of one stub-decoded 8×8 frame as a single native
  * codegen'd kernel — the DCT-domain robustness the byte-digest frame
  * dedup lacks (a re-encoded copy perturbs bytes, so an md5 misses it;
  * the low-frequency DCT signs barely move).
  *
  * Input: a BINARY frame payload read as an 8×8 luma block row-major
  * (64 bytes; shorter inputs zero-pad — by construction the frame
  * sampler only emits complete frames). Pipeline, all exact integer
  * arithmetic:
  *
  *  1. 2-D DCT-II via the shared quantized basis [[PHash64.DctBasis1024]]
  *     (`round(1024·cos(π(2x+1)u/16))`), computed separably — rows then
  *     columns, 1024 multiply-adds, max |coef| < 2^45, no overflow;
  *  2. the 63 AC coefficients compare against their LOWER MEDIAN
  *     (sorted[31] of 63 — an exact integer compare, no FP boundary);
  *  3. bits pack little-endian (AC index b → bit b−1) into a
  *     non-negative 63-bit long.
  *
  * A uniform brightness shift moves only the DC coefficient, so the hash
  * is invariant to it; per-pixel noise flips only near-median bits. The
  * DuckDB oracle replays the identical pipeline from the same basis
  * constants (single source) over the ASCII fixture (char == byte, the
  * CdcBoundaries precedent).
  */
case class PHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = PHash64.Name

  override protected def nullSafeEval(input: Any): Any =
    PHash64.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PHash64.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

object PHash64 {

  val Name = "graft_phash64"

  /** The 8×8 DCT-II basis quantized to integers, row-major `(u, x)`:
    * `round(1024 · cos(π(2x+1)u/16))`. Computed ONCE here and embedded
    * in BOTH engines (the kernel below and the generated oracle SQL), so
    * the basis can't drift between them. */
  val DctBasis1024: Array[Long] =
    (for (u <- 0 until 8; x <- 0 until 8)
      yield math.round(1024.0 * math.cos(math.Pi * (2 * x + 1) * u / 16.0))).toArray

  /** The kernel body — shared verbatim by interpreted eval and codegen
    * (the generated code calls straight into it; one static dispatch per
    * row keeps the generated method under Janino's 64KB limit where an
    * inlined 1024-term unroll would not). */
  def hash(bytes: Array[Byte]): Long = {
    val ct = DctBasis1024
    val px = new Array[Long](64)
    val n = math.min(bytes.length, 64)
    var i = 0
    while (i < n) { px(i) = bytes(i) & 0xFFL; i += 1 }
    // rows: t(u,y) = sum_x C(u,x) * px(x,y)
    val t = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0L
        var x = 0
        while (x < 8) { s += ct(u * 8 + x) * px(x * 8 + y); x += 1 }
        t(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    // cols: coef(u,v) = sum_y t(u,y) * C(v,y)
    val coef = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 8) { s += t(u * 8 + y) * ct(v * 8 + y); y += 1 }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var h = 0L
    var b = 0
    while (b < 63) {
      if (ac(b) > med) h |= 1L << b
      b += 1
    }
    h
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[PHash64].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 1, s"$Name expects (frameBytes)")
      PHash64(Cast(children.head, BinaryType))
    })
}
