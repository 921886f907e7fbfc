package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** |a ∩ b| over two string arrays as one fused native expression.
  *
  * The built-in `size(array_intersect(a, b))` materializes the whole
  * intersection array (plus internal dedup state) only to take its length;
  * Jaccard similarity needs just the cardinality. This builds one hash set
  * over the left array and counts right-side membership hits — no output
  * array, one pass each side.
  *
  * Semantics match `size(array_intersect(...))` when inputs are
  * pre-deduplicated (how every caller in DedupOps uses it — token/shingle
  * SETS); duplicate right-side elements would each count, so callers must
  * dedup first, same as the DuckDB oracle's
  * `len(list_intersect(list_distinct(..), list_distinct(..)))`.
  */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_intersection_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[Any](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { set.add(x.getUTF8String(i)); i += 1 }
    var cnt = 0
    var j = 0
    while (j < y.numElements()) {
      if (set.contains(y.getUTF8String(j))) cnt += 1
      j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      s"""
         |java.util.HashSet $set = new java.util.HashSet($a.numElements() * 2);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $set.add($a.getUTF8String($i));
         |}
         |int $cnt = 0;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if ($set.contains($b.getUTF8String($j))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectionSize =
    copy(left = newLeft, right = newRight)
}

object IntersectionSize {
  val Name = "graft_intersection_size"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[IntersectionSize].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$Name expects 2 arguments")
      // eval reads elements as UTF8String: cast both children to
      // array<string> at construction so non-string arrays fail analysis
      // (or convert) instead of ClassCastException-ing at runtime — same
      // pattern as CosineSimilarity (ImplicitCastInputTypes is private[sql])
      val Seq(a, b) = children.map(c =>
        Cast(c, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
      IntersectionSize(a, b)
    })
}
