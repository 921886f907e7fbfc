package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Fused cosine similarity over two `array<double>` columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The built-in formulation (`aggregate(zip_with(a,b,*), ...)` three times
  * over for dot and both norms) materializes an intermediate array and
  * evaluates its lambdas interpreted per element; this expression is one
  * fused loop over the two ArrayData buffers, no allocation, no virtual
  * calls. Same floating-point operation order as the built-in version
  * (sequential left-to-right adds, `dot / (sqrt(na) * sqrt(nb))`), so
  * results are bit-identical and oracle parity is preserved.
  *
  * This is tier (b) of the custom-operator preference order (SURVEY.md §4):
  * a scalar Expression, not a new plan node — similarity search composes it
  * with ordinary filter/sort/limit operators.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are normalized to array<double> by the GraftFunctions builder
  // (Catalyst's AbstractDataType / ImplicitCastInputTypes machinery is
  // private[sql], so casting happens at construction instead)
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // all locals are fresh names: GenerateUnsafeProjection's apply
      // parameter is named `i`, so a fixed `int i` loop variable is a
      // Janino redefinition error → silent interpreter fallback
      // (CodegenCompileSpec pins this compiles)
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  double $x = $a.getDouble($k);
         |  double $y = $b.getDouble($k);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product over two `array<double>` columns — the
  * [[CosineSimilarity]] kernel minus the norms: one sequential
  * left-to-right multiply-add loop, bit-identical to DuckDB's
  * `list_dot_product` (and to `aggregate(zip_with(a, b, *), ...)`),
  * whole-stage codegen. The ADC scoring path ([[graft.operators
  * .SimilarityOps.knnGraphPq]]) builds per-query lookup tables from it:
  * `floor(dot(q_s, codeword) · 1e6)` longs whose sums are exact under any
  * partitioning and engine. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val k = ctx.freshName("k")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  $dot += $a.getDouble($k) * $b.getDouble($k);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of graft's native expressions — works on any
  * session, including driver-created ones (no SparkSessionExtensions
  * wiring needed at session-build time). */
object GraftFunctions {

  val CosineName = "graft_cosine"
  val DotName = "graft_dot"

  val dotDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(DotName),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, DotName),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$DotName expects 2 arguments")
      val Seq(a, b) = children.map(c => Cast(c, ArrayType(DoubleType)))
      DotProduct(a, b)
    })

  /** (identifier, info, builder) triple — consumable both by
    * SparkSessionExtensions.injectFunction and by direct registry calls. */
  val cosineDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(CosineName),
    new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, CosineName),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$CosineName expects 2 arguments")
      val Seq(a, b) = children.map(c => Cast(c, ArrayType(DoubleType)))
      CosineSimilarity(a, b)
    })

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    Seq(cosineDescription, dotDescription, PqEncodeKernel.description, PqLutKernel.description,
        Sq8EncodeKernel.description, Sq8AdcKernel.description, SignPack64Kernel.description,
        MaxSimKernel.description,
        IntersectionSize.description, PolyFingerprint.description,
        Fnv64.description, BloomBuildAgg.description, BloomMightContain.description,
        CdcBoundaries.description, PHash64.description,
        UnigramViterbi.description)
      .foreach { d =>
        if (!registry.functionExists(d._1)) {
          registry.registerFunction(d._1, d._2, d._3)
        }
      }
  }

  /** Column-level handles (register(spark) must have run on the session
    * executing the plan). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(CosineName, a, b)

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(DotName, a, b)

  def intersectionSize(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(IntersectionSize.Name, a, b)

  def polyFp(text: Column): Column =
    org.apache.spark.sql.functions.call_function(PolyFingerprint.Name, text)

  def fnv64(text: Column): Column =
    org.apache.spark.sql.functions.call_function(Fnv64.Name, text)

  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column =
    org.apache.spark.sql.functions.call_function(BloomBuildAgg.Name, key,
      org.apache.spark.sql.functions.lit(expectedItems),
      org.apache.spark.sql.functions.lit(fpp))

  def bloomMightContain(sketch: Column, key: Column): Column =
    org.apache.spark.sql.functions.call_function(BloomMightContain.Name, sketch, key)

  def sq8Encode(v: Column): Column =
    org.apache.spark.sql.functions.call_function(Sq8EncodeKernel.Name, v)

  def sq8Adc(codes: Column, qCodes: Array[Long]): Column =
    org.apache.spark.sql.functions.call_function(Sq8AdcKernel.Name, codes,
      org.apache.spark.sql.functions.typedLit(qCodes.toSeq))

  def signPack64(v: Column): Column =
    org.apache.spark.sql.functions.call_function(SignPack64Kernel.Name, v)

  def cdcBoundaries(bin: Column, w: Int, divisor: Int): Column =
    org.apache.spark.sql.functions.call_function(CdcBoundaries.Name, bin,
      org.apache.spark.sql.functions.lit(w), org.apache.spark.sql.functions.lit(divisor))

  def phash64(frameBytes: Column): Column =
    org.apache.spark.sql.functions.call_function(PHash64.Name, frameBytes)

  def unigramViterbi(word: Column, pieces: Seq[String], units: Seq[Long]): Column =
    org.apache.spark.sql.functions.call_function(UnigramViterbi.Name, word,
      org.apache.spark.sql.functions.typedLit(pieces),
      org.apache.spark.sql.functions.typedLit(units))
}
