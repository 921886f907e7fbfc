package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VectorFns}

class TextVectorFnsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: 3-grams over tokens, short text falls back to whole text") {
    val got = Seq("a b c d e", "a b").toDF("text")
      .select(TextFns.shingles(col("text"), 3))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq("a b"))
  }

  test("minhash signatures: identical texts identical, length = nHashes") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps", "totally different words here now")
      .toDF("text")
      .select(TextFns.minHashSignature(TextFns.shingles(col("text"), 2), 8).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0)).toSeq
    assert(sigs.forall(_.length == 8))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhash: equal texts hamming 0; near texts closer than far texts") {
    val fp = (t: String) => Seq(t).toDF("text")
      .select(TextFns.simHash(TextFns.tokens(col("text")))).head.getLong(0)
    val a = fp("spark scans parquet tables with vectorized readers enabled")
    val a2 = fp("spark scans parquet tables with vectorized readers enabled")
    val near = fp("spark scans parquet tables with vectorized readers disabled")
    val far = fp("completely unrelated short text")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, a2) == 0)
    assert(ham(a, near) < ham(a, far))
  }

  test("hamming64 column matches jvm bitCount") {
    val got = Seq((0x0FL, 0x00L), (-1L, 0L), (5L, 6L)).toDF("a", "b")
      .select(TextFns.hamming64(col("a"), col("b"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(4, 64, 2))
  }

  test("stopwordHits counts distinct stopwords present") {
    val got = Seq("the cat and the hat", "no stop words here")
      .toDF("text")
      .select(TextFns.stopwordHits(col("text"), Seq("the", "and", "of")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2, 0))
  }

  test("dot and cosine match hand computation") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val dot = df.select(VectorFns.dot(col("a"), col("b"))).head.getDouble(0)
    assert(dot == 32.0)
    val cos = df.select(VectorFns.cosine(col("a"), col("a"))).head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val orth = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(orth == 0.0)
  }

  test("rhpBucket is deterministic and bounded") {
    val df = Seq(Seq(0.5, -1.0, 2.0), Seq(0.5, -1.0, 2.0), Seq(-0.5, 1.0, -2.0))
      .toDF("v").select(VectorFns.rhpBucket(col("v"), 6).as("b"))
    val got = df.collect().map(_.getInt(0)).toSeq
    assert(got(0) == got(1))
    assert(got.forall(b => b >= 0 && b < 64))
    // antipodal vectors land in complementary buckets
    assert(got(0) == (~got(2) & 63))
  }

  test("rollingFingerprint: deterministic, order-sensitive") {
    val fps = Seq("a b c", "a b c", "c b a").toDF("text")
      .select(TextFns.rollingFingerprint(col("text"))).collect().map(_.getLong(0)).toSeq
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("polyFingerprint matches the reference char fold and is order-sensitive") {
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val texts = Seq("hello world", "world hello", "")
    val fps = texts.toDF("text")
      .select(TextFns.polyFingerprint(col("text"))).collect().map(_.getLong(0)).toSeq
    assert(fps == texts.map(ref))
    assert(fps(0) != fps(1))
    // the native codegen kernel agrees with the HOF reference formulation
    graft.plans.GraftFunctions.register(spark)
    val native = texts.toDF("text")
      .select(graft.plans.GraftFunctions.polyFp(col("text"))).collect().map(_.getLong(0)).toSeq
    assert(native == fps)
  }
}
