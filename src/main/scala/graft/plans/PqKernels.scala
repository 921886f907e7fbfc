package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.sql.Column

/** Fused product-quantization kernels.
  *
  * The composed formulation (m·c cosine/dot kernels inlined into one
  * projection — `array(cellExpr(slice(v)...), ...)`) generates JVM
  * bytecode LINEAR in m·c: at m=16, c=16 the 256 inlined loop bodies
  * blow Janino's 64 KB method limit and whole-stage codegen silently
  * falls back to interpreted eval over the corpus-sized encode — the
  * exact failure mode CodegenCompileSpec exists to catch. These kernels
  * hold the codebooks as a REFERENCE OBJECT (`ctx.addReferenceObj`, a
  * `double[][]` indexed `s·c + (code−1)`) and loop over it, so the
  * generated method is constant-size for any PQ geometry and the whole
  * encode/LUT projection stays inside one whole-stage-codegen span.
  *
  * Float parity contracts (oracle-replayed, so they are load-bearing):
  *  - cosine and dot are the same sequential left-to-right folds as
  *    [[CosineSimilarity]] / [[DotProduct]] / DuckDB's list_dot_product;
  *  - a subvector shorter than subDim (ragged tail row) folds only its
  *    available elements — exactly `slice()`'s clamping composed with
  *    the kernels' min-length loop;
  *  - code argmax ties resolve to the SMALLEST code, matching the
  *    `array_max((csim, -cid))` formulation and the oracle's
  *    `CASE WHEN c1 >= c2 AND ... THEN 1` chain.
  */
object PqKernels {
  /** Flatten (code, codeword) codebooks into the kernel layout; validates
    * the 1..c consecutive-code contract the positional lookups assume. */
  def flatten(codebooks: Seq[Seq[(Int, Seq[Double])]]): Array[Array[Double]] = {
    require(codebooks.nonEmpty, "no codebooks")
    val c = codebooks.head.size
    require(codebooks.forall(_.size == c), "ragged codebooks")
    require(codebooks.forall(cb => cb.map(_._1).sorted == (1 to c)),
      "codes must be 1..c per subspace (positional lookup)")
    codebooks.flatMap(_.sortBy(_._1).map(_._2.toArray)).toArray
  }

  /** The registry builders receive the codebooks as a FOLDABLE nested-array
    * literal child and evaluate it once at resolution — the kernel keeps
    * the resulting `double[][]` as a reference object; the literal child
    * is dropped from the tree, so plan/codegen size stays constant in the
    * PQ geometry. */
  private[plans] def booksOf(e: Expression): Array[Array[Double]] = {
    require(e.foldable, "codebooks must be a literal")
    val ad = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val w = ad.getArray(i)
      Array.tabulate(w.numElements())(j => w.getDouble(j))
    }
  }

  private[plans] def intOf(e: Expression): Int = {
    require(e.foldable, "expected a literal int")
    e.eval().asInstanceOf[Number].intValue()
  }
}

/** `array<int>` of m codes: per subspace, the cosine-argmax codeword
  * (ties to the smallest code) — [[graft.operators.SimilarityOps.pqEncode]]'s
  * row kernel. */
case class PqEncodeKernel(
    child: Expression,
    books: Array[Array[Double]],
    m: Int,
    c: Int,
    subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 1; var bestCos = Double.NegativeInfinity
      var ci = 0
      while (ci < c) {
        val w = books(s * c + ci)
        val off = s * subDim
        val n = math.min(subDim, math.max(0, v.numElements() - off))
        var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
        while (j < n) {
          val x = v.getDouble(off + j); val y = w(j)
          dot += x * y; na += x * x; nb += y * y
          j += 1
        }
        val cos = dot / (math.sqrt(na) * math.sqrt(nb))
        if (cos > bestCos) { bestCos = cos; best = ci + 1 }
        ci += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("pqBooks", books, "double[][]")
      val out = ctx.freshName("codes")
      val s = ctx.freshName("s"); val ci = ctx.freshName("ci"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestCos = ctx.freshName("bestCos")
      val w = ctx.freshName("w"); val off = ctx.freshName("off"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val cos = ctx.freshName("cos")
      s"""
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 1; double $bestCos = Double.NEGATIVE_INFINITY;
         |  for (int $ci = 0; $ci < $c; $ci++) {
         |    double[] $w = $b[$s * $c + $ci];
         |    int $off = $s * $subDim;
         |    int $n = java.lang.Math.min($subDim, java.lang.Math.max(0, $v.numElements() - $off));
         |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double $x = $v.getDouble($off + $j); double $y = $w[$j];
         |      $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |    }
         |    double $cos = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    if ($cos > $bestCos) { $bestCos = $cos; $best = $ci + 1; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeKernel =
    copy(child = newChild)
}

object PqEncodeKernel {
  val Name = "graft_pq_encode"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[PqEncodeKernel].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 3, s"$Name expects (vector, books_literal, c)")
      val books = PqKernels.booksOf(children(1))
      val c = PqKernels.intOf(children(2))
      require(c >= 1 && books.length % c == 0, s"$Name: books length not divisible by c")
      PqEncodeKernel(Cast(children(0), ArrayType(DoubleType)), books,
        books.length / c, c, books.headOption.map(_.length).getOrElse(0))
    })
}

/** `array<long>` of m·c fixed-point ADC lookup entries for ONE query row:
  * entry `s·c + (code−1)` is `floor(dot(v_s, codeword) · scale)` — the
  * per-query LUT [[graft.operators.SimilarityOps.knnGraphPq]] carries
  * through the candidate join. */
case class PqLutKernel(
    child: Expression,
    books: Array[Array[Double]],
    m: Int,
    c: Int,
    subDim: Int,
    scale: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](m * c)
    var s = 0
    while (s < m) {
      var ci = 0
      while (ci < c) {
        val w = books(s * c + ci)
        val off = s * subDim
        val n = math.min(subDim, math.max(0, v.numElements() - off))
        var dot = 0.0; var j = 0
        while (j < n) { dot += v.getDouble(off + j) * w(j); j += 1 }
        out(s * c + ci) = math.floor(dot * scale).toLong
        ci += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("pqBooks", books, "double[][]")
      val out = ctx.freshName("lut")
      val s = ctx.freshName("s"); val ci = ctx.freshName("ci"); val j = ctx.freshName("j")
      val w = ctx.freshName("w"); val off = ctx.freshName("off"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |long[] $out = new long[${m * c}];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $ci = 0; $ci < $c; $ci++) {
         |    double[] $w = $b[$s * $c + $ci];
         |    int $off = $s * $subDim;
         |    int $n = java.lang.Math.min($subDim, java.lang.Math.max(0, $v.numElements() - $off));
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) { $dot += $v.getDouble($off + $j) * $w[$j]; }
         |    $out[$s * $c + $ci] = (long) java.lang.Math.floor($dot * $scale);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLutKernel =
    copy(child = newChild)
}

object PqLutKernel {
  val Name = "graft_pq_lut"
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[PqLutKernel].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 4, s"$Name expects (vector, books_literal, c, scale)")
      val books = PqKernels.booksOf(children(1))
      val c = PqKernels.intOf(children(2))
      require(c >= 1 && books.length % c == 0, s"$Name: books length not divisible by c")
      require(children(3).foldable, s"$Name: scale must be a literal")
      PqLutKernel(Cast(children(0), ArrayType(DoubleType)), books,
        books.length / c, c, books.headOption.map(_.length).getOrElse(0),
        children(3).eval().asInstanceOf[Number].doubleValue())
    })
}

/** Column builders: the codebooks travel to the builder as one
  * `typedLit` nested-array literal (resolution-time state, dropped from
  * the final expression tree). */
object PqColumns {
  import org.apache.spark.sql.functions.{call_function, lit, typedLit}

  def pqCodes(v: Column, codebooks: Seq[Seq[(Int, Seq[Double])]]): Column = {
    val flat = PqKernels.flatten(codebooks)
    call_function(PqEncodeKernel.Name, v,
      typedLit(flat.map(_.toSeq).toSeq), lit(codebooks.head.size))
  }

  def pqLut(v: Column, codebooks: Seq[Seq[(Int, Seq[Double])]], scale: Double = 1e6): Column = {
    val flat = PqKernels.flatten(codebooks)
    call_function(PqLutKernel.Name, v,
      typedLit(flat.map(_.toSeq).toSeq), lit(codebooks.head.size), lit(scale))
  }
}
