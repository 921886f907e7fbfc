package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Build a Bloom filter over a LONG key column as a mergeable aggregate:
  * `graft_bloom_agg(key, expectedItems, fpp)` returns the serialized
  * sketch (binary). Partial buffers are per-partition filters merged by
  * bitwise OR, so the result is ORDER- AND PARTITIONING-INDEPENDENT —
  * byte-identical however the input was split — and the aggregate ships
  * fixed-size state (the m-bit array), never rows.
  *
  * This is the build side of the broadcast-semi-join pattern
  * (DedupOps.incrementalExactBloom): at 100 TB, a digest set too big to
  * broadcast exactly collapses to ~1.2 bytes/key at 1% FPP — a sketch a
  * driver can hold and every executor can probe — and the filter's
  * no-false-negative guarantee means an exact confirm join downstream
  * restores exact semantics. The same broadcast-prefilter shape Spark's
  * own runtime row-level filtering injects for shuffle joins, exposed as
  * an explicit, persistable operator.
  *
  * The underlying sketch is Spark's public `org.apache.spark.util.sketch.
  * BloomFilter` (the `DataFrameStatFunctions.bloomFilter` one), so
  * serialized bytes interoperate with any Spark tooling. Null keys are
  * skipped (SQL aggregate convention); the empty-input result is the
  * empty filter (matches nothing).
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "expectedItems must be positive")
  require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter =
    buffer.mergeInPlace(other)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

object BloomBuildAgg {

  val Name = "graft_bloom_agg"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[BloomBuildAgg].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"$Name expects 3 arguments: key, expectedItems, fpp")
      val Seq(key, items, fpp) = children
      require(items.foldable && fpp.foldable,
        s"$Name sizing arguments must be literals")
      BloomBuildAgg(
        Cast(key, LongType),
        Cast(items, LongType).eval(null).asInstanceOf[Long],
        Cast(fpp, DoubleType).eval(null).asInstanceOf[Double])
    })
}

/** `graft_bloom_might_contain(sketchBytes, key)` — probe a serialized
  * [[BloomBuildAgg]] sketch. The sketch side must be a LITERAL (the
  * broadcast-prefilter contract: the driver holds the sketch, the plan
  * ships it once in the codegen references, every row probes in-memory —
  * a per-row deserialize would be absurd, and a non-literal sketch column
  * has no sane semantics here). Deserialized ONCE per plan on the driver;
  * codegen probes the shared object, keeping the filter inside
  * whole-stage codegen (no UDF, no fallback).
  *
  * No false negatives ever; false positives at the sketch's FPP — callers
  * either tolerate them (pure prefilter) or confirm exactly downstream
  * (DedupOps.incrementalExactBloom). A null sketch yields null; a null
  * key yields null (SQL convention).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override def nullable: Boolean = bloom == null || right.nullable

  @transient private lazy val bloom: BloomFilter = {
    require(left.foldable,
      s"$prettyName: the sketch argument must be a literal/foldable " +
        "expression (build it with graft_bloom_agg and inline the bytes)")
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null else BloomFilter.readFrom(bytes)
  }

  override def eval(input: InternalRow): Any =
    if (bloom == null) null
    else {
      val v = right.eval(input)
      if (v == null) null
      else java.lang.Boolean.valueOf(bloom.mightContainLong(v.asInstanceOf[Long]))
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (bloom == null) ExprCode.forNullValue(BooleanType)
    else {
      // the deserialized sketch rides the codegen reference array — the
      // byte literal itself never appears in generated Java (a multi-MB
      // array literal would blow the 64 KB method limit instantly)
      val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
      val v = right.genCode(ctx)
      ev.copy(code =
        code"""
           |${v.code}
           |boolean ${ev.isNull} = ${v.isNull};
           |boolean ${ev.value} = false;
           |if (!${ev.isNull}) {
           |  ${ev.value} = $ref.mightContainLong(${v.value});
           |}
         """.stripMargin)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {

  val Name = "graft_bloom_might_contain"

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[BloomMightContain].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$Name expects 2 arguments: sketch, key")
      BloomMightContain(
        Cast(children.head, BinaryType),
        Cast(children(1), LongType))
    })
}
