package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram piece model — the
  * E-step kernel of the SentencePiece-style tokenizer trainer (Kudo
  * 2018, arXiv:1804.10959, hard-EM variant): the single best
  * tokenization `argmin Σ nll(piece)` over all ways to split the word
  * into vocabulary pieces, by exact-integer DP over the word's
  * positions (`cost[i] = min_l cost[i-l] + nll(word[i-l..i))`).
  *
  * Determinism contract (the property the DuckDB oracle's brute-force
  * enumeration must reproduce): costs are INTEGER nll units, and exact
  * ties break to the lexicographically smallest piece sequence, compared
  * as the pieces joined with the `\u0001` separator. The separator is
  * smaller than every piece character, which makes prefix comparison
  * stable under a shared suffix (`s1 < s2 ⟹ s1+sep+t < s2+sep+t` even
  * when s1 is a proper prefix of s2), so keeping ONE best (cost, path)
  * per position is a valid DP for the lexicographic objective — the
  * stored prefix always extends to the global winner.
  *
  * A word with no full segmentation (a character missing from the
  * vocabulary) returns the EMPTY array — absent from downstream counts,
  * matching the enumeration oracle, which simply finds no complete path.
  * Callers that need total coverage union all single characters into the
  * vocabulary (the trainer does).
  *
  * Scale shape: runs on the DISTINCT-WORD table (the BPE argument —
  * Zipf makes it millions of rows at 100 TB, never the corpus), with the
  * bounded vocabulary as a reference object; O(len · maxPieceLen) table
  * probes per word. */
case class UnigramViterbi(child: Expression, pieces: Array[String],
    units: Array[Long]) extends UnaryExpression {

  require(pieces.length == units.length && pieces.nonEmpty,
    "pieces and units must be same-length and non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = UnigramViterbi.Name

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), units(i)); i += 1 }
    m
  }

  @transient private lazy val maxPieceLen: Int = pieces.map(_.length).max

  override protected def nullSafeEval(input: Any): Any =
    UnigramViterbi.segment(
      input.asInstanceOf[UTF8String].toString, table, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table,
      "java.util.HashMap<String, Long>")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.plans.UnigramViterbi.segment($c.toString(), $tableRef, $maxPieceLen);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {

  val Name = "graft_unigram_viterbi"

  private val Sep = '\u0001'

  /** The DP body — shared by interpreted eval and codegen. */
  def segment(word: String,
      table: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): ArrayData = {
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val cost = Array.fill(n + 1)(Long.MaxValue)
    val path = new Array[String](n + 1)
    cost(0) = 0L
    path(0) = ""
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (cost(i - l) != Long.MaxValue) {
          val u = table.get(word.substring(i - l, i))
          if (u != null) {
            val c = cost(i - l) + u.longValue()
            if (c < cost(i)) {
              cost(i) = c
              path(i) = path(i - l) + Sep + word.substring(i - l, i)
            } else if (c == cost(i)) {
              val s = path(i - l) + Sep + word.substring(i - l, i)
              if (s < path(i)) path(i) = s
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (cost(n) == Long.MaxValue) return new GenericArrayData(Array.empty[Any])
    // path(n) = "\u0001p1\u0001p2..." — split and drop the leading empty
    val parts = path(n).split(Sep).filter(_.nonEmpty)
    new GenericArrayData(parts.map(p => UTF8String.fromString(p): Any))
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(Name),
    new ExpressionInfo(classOf[UnigramViterbi].getCanonicalName, Name),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"$Name expects (word, pieces_literal, units_literal)")
      def strings(e: Expression): Array[String] = {
        require(e.foldable, s"$Name: pieces must be a literal array")
        val ad = e.eval().asInstanceOf[ArrayData]
        Array.tabulate(ad.numElements())(j =>
          ad.getUTF8String(j).toString)
      }
      def longs(e: Expression): Array[Long] = {
        require(e.foldable, s"$Name: units must be a literal array")
        val ad = e.eval().asInstanceOf[ArrayData]
        Array.tabulate(ad.numElements())(ad.getLong)
      }
      UnigramViterbi(children.head, strings(children(1)), longs(children(2)))
    })
}
