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

  /** Codegen snippet: declares `long acc = <init>;`, iterates the code
    * points of the UTF8String variable `c`, and applies `foldStmt` (Java
    * statement that may reference `acc` and the current codepoint `cp`). */
  def loopCode(c: String, init: String, foldStmt: String): String =
    s"""
       |int n = $c.numBytes();
       |long acc = $init;
       |int i = 0;
       |while (i < n) {
       |  int b0 = $c.getByte(i) & 0xFF;
       |  int cp;
       |  if (b0 < 0x80) { cp = b0; i += 1; }
       |  else if (b0 < 0xE0) {
       |    cp = ((b0 & 0x1F) << 6) | ($c.getByte(i + 1) & 0x3F); i += 2;
       |  } else if (b0 < 0xF0) {
       |    cp = ((b0 & 0x0F) << 12) | (($c.getByte(i + 1) & 0x3F) << 6)
       |      | ($c.getByte(i + 2) & 0x3F); i += 3;
       |  } else {
       |    cp = ((b0 & 0x07) << 18) | (($c.getByte(i + 1) & 0x3F) << 12)
       |      | (($c.getByte(i + 2) & 0x3F) << 6) | ($c.getByte(i + 3) & 0x3F); i += 4;
       |  }
       |  $foldStmt
       |}
     """.stripMargin
}
