package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Char-level polynomial rolling fingerprint `(acc*31 + byte) mod 1e9+7`
  * as a native codegen'd expression: one fused loop over the UTF8String's
  * bytes, no substring allocation, no interpreted lambda per character —
  * the higher-order formulation (TextFns.polyFingerprint, kept as the
  * cross-check reference) costs a `substr` + `ascii` interpreted call per
  * character and dominated the fingerprint query's runtime (3.3s -> sub-
  * second at sf0.1).
  *
  * Folds CODE POINTS (decoded inline from the UTF-8 bytes, see
  * Utf8CodePoints), exactly the oracle's `list_reduce` over
  * `unicode(text[i])` formulation — identical to a byte fold on ASCII,
  * and parity holds on multi-byte characters too. The modulus keeps every
  * intermediate below 2^51 (acc < 1e9+7, cp < 2^21), overflow-free in
  * both engines.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_poly_fp"

  override protected def nullSafeEval(input: Any): Any =
    Utf8CodePoints.fold(input.asInstanceOf[UTF8String], 0L) {
      (acc, cp) => (acc * 31L + cp) % 1000000007L
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (loop, acc) = Utf8CodePoints.loopCode(ctx, c, "0L") {
        (a, cp) => s"$a = ($a * 31L + $cp) % 1000000007L;"
      }
      s"""
         |$loop
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {

  val Name = "graft_poly_fp"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[PolyFingerprint].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 1, s"$Name expects 1 argument")
      PolyFingerprint(Cast(children.head, StringType))
    })
}
