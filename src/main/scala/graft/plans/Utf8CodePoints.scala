package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** Shared code-point iteration for the native string kernels (Fnv64,
  * PolyFingerprint).
  *
  * The DuckDB oracles fold over CODE POINTS (`unicode(text[i])` /
  * `list_reduce` over per-character codepoints), so the Spark kernels must
  * fold code points too — folding raw UTF-8 bytes agrees only on ASCII and
  * silently diverges on any multi-byte character (a 2-byte "é" would fold
  * as two masked bytes 0xC3, 0xA9 instead of the single codepoint 0xE9).
  * Decoding inline from the UTF8String's bytes keeps the loop
  * allocation-free (no toString) in both the interpreted and codegen paths.
  *
  * Assumes well-formed UTF-8, which UTF8String values coming from Spark
  * readers/literals are; continuation-byte arithmetic is the standard
  * 1/2/3/4-byte decode.
  */
private[plans] object Utf8CodePoints {

  /** Interpreted-path fold over the code points of `s`. */
  def fold(s: UTF8String, init: Long)(f: (Long, Int) => Long): Long = {
    val n = s.numBytes()
    var acc = init
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      if (b0 < 0x80) {
        acc = f(acc, b0); i += 1
      } else if (b0 < 0xE0) {
        acc = f(acc, ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F)); i += 2
      } else if (b0 < 0xF0) {
        acc = f(acc,
          ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
            (s.getByte(i + 2) & 0x3F)); i += 3
      } else {
        acc = f(acc,
          ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
            ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)); i += 4
      }
    }
    acc
  }

  /** Codegen snippet: declares a long accumulator initialized to `init`,
    * iterates the code points of the UTF8String variable `c`, applies
    * `fold(accVar, cpVar)` per code point, and returns
    * `(javaCode, accVar)` so the caller assigns `ev.value = accVar`.
    *
    * Two Janino constraints shape the emitted Java (round-7 defect: both
    * kernels silently fell back to interpreted eval):
    *  - every local is a `ctx.freshName`: `GenerateUnsafeProjection`'s
    *    `apply(InternalRow i)` parameter is literally named `i`, so a
    *    fixed-name `int i` local is a forbidden redefinition (and two
    *    kernel instances in one non-nullable projection would collide);
    *  - no parenthesized expression directly before `<<`: Janino rejects
    *    `($c.getByte(pos+1) & 0x3F) << 6` with `Expression "..." is not a
    *    type`, so continuation bytes are hoisted into locals and shifts
    *    apply to bare identifiers (`<<` binds tighter than `|`, so
    *    `h << 6 | b1` needs no parentheses).
    * CodegenCompileSpec pins both: the snippet must compile under
    * GenerateUnsafeProjection (which throws instead of falling back). */
  def loopCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      c: String,
      init: String)(fold: (String, String) => String): (String, String) = {
    val n = ctx.freshName("nBytes")
    val acc = ctx.freshName("acc")
    val pos = ctx.freshName("pos")
    val b0 = ctx.freshName("b0")
    val cp = ctx.freshName("cp")
    val b1 = ctx.freshName("b1")
    val b2 = ctx.freshName("b2")
    val b3 = ctx.freshName("b3")
    val hi = ctx.freshName("hi")
    val code =
      s"""
         |int $n = $c.numBytes();
         |long $acc = $init;
         |int $pos = 0;
         |while ($pos < $n) {
         |  int $b0 = $c.getByte($pos) & 0xFF;
         |  int $cp;
         |  if ($b0 < 0x80) { $cp = $b0; $pos += 1; }
         |  else if ($b0 < 0xE0) {
         |    int $b1 = $c.getByte($pos + 1) & 0x3F;
         |    int $hi = $b0 & 0x1F;
         |    $cp = $hi << 6 | $b1; $pos += 2;
         |  } else if ($b0 < 0xF0) {
         |    int $b1 = $c.getByte($pos + 1) & 0x3F;
         |    int $b2 = $c.getByte($pos + 2) & 0x3F;
         |    int $hi = $b0 & 0x0F;
         |    $cp = $hi << 12 | $b1 << 6 | $b2; $pos += 3;
         |  } else {
         |    int $b1 = $c.getByte($pos + 1) & 0x3F;
         |    int $b2 = $c.getByte($pos + 2) & 0x3F;
         |    int $b3 = $c.getByte($pos + 3) & 0x3F;
         |    int $hi = $b0 & 0x07;
         |    $cp = $hi << 18 | $b1 << 12 | $b2 << 6 | $b3; $pos += 4;
         |  }
         |  ${fold(acc, cp)}
         |}
       """.stripMargin
    (code, acc)
  }
}
