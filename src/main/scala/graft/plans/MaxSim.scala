package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.Column

/** MaxSim — ColBERT-style late interaction (Khattab & Zaharia, SIGIR
  * 2020): a document and a query are each a BAG of token vectors; the
  * score is Σ_i max_j sim(q_i, d_j) — every query token finds its best
  * document token, no pooling before the interaction. Here both sides are
  * the flat embedding column sliced into T = d/subDim token vectors (the
  * PQ subspace geometry reused as token geometry).
  *
  * Per-pair similarity is the FIXED-POINT floored cosine
  * `floor(cos · scale)` (a long), undefined pairs (zero-norm token on
  * either side) contribute 0 — so the per-query-token max and the final
  * sum are exact integer math: the total is order-independent and
  * bit-identical across engines/partitionings, the property every
  * DuckDB-replayed oracle here leans on. One fused loop per row
  * (T² cosine kernels over the two buffers, constant-size generated
  * bytecode — query tokens ride as a reference object).
  */
case class MaxSimKernel(
    child: Expression,
    qTokens: Array[Array[Double]],
    subDim: Int,
    scale: Double)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_maxsim"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nDoc = (v.numElements() + subDim - 1) / subDim
    var total = 0L
    var i = 0
    while (i < qTokens.length) {
      val q = qTokens(i)
      var best = Long.MinValue
      var j = 0
      while (j < nDoc) {
        val off = j * subDim
        val n = math.min(math.min(subDim, q.length), v.numElements() - off)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var t = 0
        while (t < n) {
          val x = q(t); val y = v.getDouble(off + t)
          dot += x * y; na += x * x; nb += y * y
          t += 1
        }
        val s =
          if (na == 0.0 || nb == 0.0) 0L
          else math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * scale).toLong
        if (s > best) best = s
        j += 1
      }
      if (nDoc > 0) total += best
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val q = ctx.addReferenceObj("maxsimQ", qTokens, "double[][]")
      val nDoc = ctx.freshName("nDoc"); val total = ctx.freshName("total")
      val i = ctx.freshName("qi"); val j = ctx.freshName("dj"); val t = ctx.freshName("t")
      val qt = ctx.freshName("qt"); val best = ctx.freshName("best")
      val off = ctx.freshName("off"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val s = ctx.freshName("s")
      s"""
         |int $nDoc = ($v.numElements() + $subDim - 1) / $subDim;
         |long $total = 0L;
         |for (int $i = 0; $i < $q.length; $i++) {
         |  double[] $qt = $q[$i];
         |  long $best = Long.MIN_VALUE;
         |  for (int $j = 0; $j < $nDoc; $j++) {
         |    int $off = $j * $subDim;
         |    int $n = java.lang.Math.min(java.lang.Math.min($subDim, $qt.length),
         |      $v.numElements() - $off);
         |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |    for (int $t = 0; $t < $n; $t++) {
         |      double $x = $qt[$t]; double $y = $v.getDouble($off + $t);
         |      $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |    }
         |    long $s = ($na == 0.0 || $nb == 0.0) ? 0L
         |      : (long) java.lang.Math.floor($dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)) * $scale);
         |    if ($s > $best) $best = $s;
         |  }
         |  if ($nDoc > 0) $total += $best;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxSimKernel =
    copy(child = newChild)
}

object MaxSimKernel {
  val Name = "graft_maxsim"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[MaxSimKernel].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 4, s"$Name expects (vector, q_tokens_literal, sub_dim, scale)")
      val q = PqKernels.booksOf(children(1))
      val subDim = PqKernels.intOf(children(2))
      require(subDim >= 1, s"$Name: sub_dim >= 1")
      require(children(3).foldable, s"$Name: scale must be a literal")
      MaxSimKernel(Cast(children.head, ArrayType(DoubleType)), q, subDim,
        children(3).eval().asInstanceOf[Number].doubleValue())
    })
}

object MaxSimColumns {
  import org.apache.spark.sql.functions.{call_function, lit, typedLit}

  /** `Σ_i max_j floor(cos(q_i, doc_j)·scale)` as a long column; `qTokens`
    * is the query's token bag (driver-side slices of the query vector). */
  def maxSim(v: Column, qTokens: Seq[Seq[Double]], subDim: Int, scale: Double = 1e6): Column =
    call_function(MaxSimKernel.Name, v,
      typedLit(qTokens.map(_.toSeq)), lit(subDim), lit(scale))

  /** Slice a flat vector into its token bag (driver-side twin of the
    * kernel's document-side slicing). */
  def tokensOf(v: Seq[Double], subDim: Int): Seq[Seq[Double]] =
    v.grouped(subDim).map(_.toSeq).toSeq
}
