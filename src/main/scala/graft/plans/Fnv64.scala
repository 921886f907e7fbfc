package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash over a string's bytes as a native codegen'd
  * expression: `h = (h ^ byte) * 0x100000001b3` folded from the offset
  * basis `0xcbf29ce484222325`, wrapping mod 2^64 (Java long arithmetic).
  *
  * This is the CROSS-ENGINE token hash for the simhash dedup path: unlike
  * xxhash64 (Spark-internal, not available in ANSI SQL engines), the FNV-1a
  * fold is expressible verbatim in DuckDB as a `list_reduce` over
  * codepoints in HUGEINT arithmetic (`(xor(acc, c) * 1099511628211) %
  * 2^64`), so the full simhash pipeline — per-token hash, per-bit majority
  * vote, banded block join, hamming filter — is hash-checkable against an
  * independent oracle. The large offset basis and 40-bit prime churn all 64
  * output bits from the first byte (a plain `acc*31+c` polynomial leaves
  * the high bits of short tokens zero, which would degenerate the simhash
  * block keys).
  *
  * Folds CODE POINTS (decoded inline from the UTF-8 bytes, see
  * Utf8CodePoints), exactly the oracle's `unicode(tok[i])` formulation —
  * identical to a byte fold on ASCII, and parity holds on multi-byte
  * characters too (same convention as PolyFingerprint).
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fnv64"

  override protected def nullSafeEval(input: Any): Any =
    Utf8CodePoints.fold(input.asInstanceOf[UTF8String], 0xcbf29ce484222325L) {
      (acc, cp) => (acc ^ cp) * 0x100000001b3L
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (loop, acc) = Utf8CodePoints.loopCode(ctx, c, "0xcbf29ce484222325L") {
        (a, cp) => s"$a = ($a ^ $cp) * 0x100000001b3L;"
      }
      s"""
         |$loop
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {

  val Name = "graft_fnv64"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[Fnv64].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 1, s"$Name expects 1 argument")
      Fnv64(Cast(children.head, StringType))
    })
}
