package graft

import graft.plans.{CosineSimilarity, Fnv64, GraftFunctions, IntersectionSize, PolyFingerprint}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** No-fallback gate for the native codegen kernels.
  *
  * `GenerateUnsafeProjection.generate` compiles the generated Java with
  * Janino and THROWS on a compile error — unlike the query path, where
  * `UnsafeProjection.create` catches the `CompileException` and silently
  * falls back to interpreted eval (the round-7 defect: the continuation-
  * byte decode emitted `($c.getByte(i+1) & 0x3F) << 6`, which Janino
  * rejects with `Expression "..." is not a type`, so graft_fnv64 /
  * graft_poly_fp ran interpreted on every row while the oracles stayed
  * green). Compiling here, without the safety net, makes any regression a
  * hard test failure instead of a WARN line nobody reads.
  */
class CodegenCompileSpec extends SparkSpec {

  // multi-byte coverage: 2-byte (é, ö), 3-byte (CJK, cyrillic), 4-byte (emoji)
  private val samples = Seq(
    "", "a", "hello world 42", "héllo wörld", "ζωή και επιστήμη",
    "наука о данных", "日本語テキスト処理", "mixed ascii + é + 日本 + 🌍🚀")

  private def strRow(s: String): InternalRow = InternalRow(UTF8String.fromString(s))

  test("Fnv64 generated code compiles and matches the interpreted path") {
    val expr = Fnv64(BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino failure
    for (s <- samples) {
      assert(proj(strRow(s)).getLong(0) === expr.eval(strRow(s)),
        s"codegen/interpreted divergence on '$s'")
    }
  }

  test("PolyFingerprint generated code compiles and matches the interpreted path") {
    val expr = PolyFingerprint(BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    for (s <- samples) {
      assert(proj(strRow(s)).getLong(0) === expr.eval(strRow(s)),
        s"codegen/interpreted divergence on '$s'")
    }
  }

  test("CdcBoundaries generated code compiles; rolling == per-window recompute; matches eval") {
    import graft.plans.CdcBoundaries
    import org.apache.spark.sql.types.BinaryType
    val w = 5; val div = 4
    val expr = CdcBoundaries(BoundReference(0, BinaryType, nullable = true), w, div)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino failure
    // real binary incl. negative bytes, zeros, and lengths around w
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](1, 2, 3),
      Array.tabulate(4)(i => i.toByte),
      Array.tabulate(200)(i => ((i * 131 + 17) % 256).toByte),
      Array.tabulate(64)(_ => 0.toByte),
      Array.tabulate(97)(i => (255 - i % 256).toByte))
    def refBoundaries(bytes: Array[Byte]): Seq[Int] = {
      val P = 1000000007L
      (1 to bytes.length - w).filter { p =>
        var h = 0L
        (0 until w).foreach(j => h = (h * 31L + (bytes(p + j) & 0xFF)) % P)
        h % div == 0
      }
    }
    for (bytes <- cases) {
      val row = InternalRow(bytes)
      val got = proj(row).getArray(0).toIntArray().toSeq
      assert(got == refBoundaries(bytes), s"codegen mismatch on len ${bytes.length}")
      assert(expr.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq == got, s"eval/codegen divergence on len ${bytes.length}")
    }
  }

  test("two kernel instances in one projection compile (locals block-scoped, non-nullable child)") {
    // non-nullable children: nullSafeCodeGen emits the kernel body without
    // an if-wrapper, so without explicit braces the fixed-name locals of
    // two instances would collide in the same generated method
    val exprs = Seq(
      Fnv64(BoundReference(0, StringType, nullable = false)),
      PolyFingerprint(BoundReference(0, StringType, nullable = false)),
      Fnv64(BoundReference(1, StringType, nullable = false)))
    val proj = GenerateUnsafeProjection.generate(exprs)
    val row = InternalRow(UTF8String.fromString("héllo 🌍"), UTF8String.fromString("日本語"))
    assert(proj(row).getLong(0) === exprs(0).eval(row))
    assert(proj(row).getLong(1) === exprs(1).eval(row))
    assert(proj(row).getLong(2) === exprs(2).eval(row))
  }

  test("CosineSimilarity and IntersectionSize generated code compiles") {
    val cos = CosineSimilarity(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true))
    val isect = IntersectionSize(
      BoundReference(2, ArrayType(StringType), nullable = true),
      BoundReference(3, ArrayType(StringType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(cos, isect))
    val row = InternalRow(
      new GenericArrayData(Array(1.0, 2.0, 3.0)),
      new GenericArrayData(Array(3.0, 2.0, 1.0)),
      new GenericArrayData(Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b"))),
      new GenericArrayData(Array[Any](UTF8String.fromString("b"), UTF8String.fromString("c"))))
    assert(proj(row).getDouble(0) === cos.eval(row))
    assert(proj(row).getInt(1) === 1)
  }

  test("DotProduct generated code compiles and matches eval + the sequential-fold reference") {
    val dot = graft.plans.DotProduct(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(dot)) // throws on Janino failure
    val cases = Seq(
      (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
      (Array(0.1, -0.7, 2.5, 1e-9), Array(-4.2, 0.3, 0.0, 1e9)),
      (Array.empty[Double], Array.empty[Double]))
    for ((a, b) <- cases) {
      val row = InternalRow(new GenericArrayData(a), new GenericArrayData(b))
      val ref = graft.operators.SimilarityOps.dotOf(a.toSeq, b.toSeq)
      assert(proj(row).getDouble(0) === dot.eval(row))
      assert(proj(row).getDouble(0) === ref, s"dot fold order diverged on ${a.toSeq}")
    }
  }

  test("PQ kernels compile at m=16 c=16 (the 64 KB geometry) and match the composed reference") {
    // the composed formulation (m·c inlined cosine/dot kernels) blows
    // Janino's 64 KB method limit at this geometry and silently falls
    // back to interpreted eval; the fused kernels must compile — throws
    // here on regression — and reproduce the slice+cosine-argmax /
    // slice+dot-floor semantics exactly
    import graft.plans.{PqEncodeKernel, PqLutKernel, PqKernels}
    import graft.operators.SimilarityOps
    val m = 16; val c = 16; val subDim = 4; val dim = m * subDim
    def wvec(s: Int, ci: Int): Seq[Double] =
      (0 until subDim).map(j => ((s * 31 + ci * 17 + j * 7) % 11 - 5) / 5.0 + 0.01)
    val codebooks = (0 until m).map(s => (1 to c).map(ci => (ci, wvec(s, ci))))
    val flat = PqKernels.flatten(codebooks)
    val enc = PqEncodeKernel(
      BoundReference(0, ArrayType(DoubleType), nullable = true), flat, m, c, subDim)
    val lut = PqLutKernel(
      BoundReference(0, ArrayType(DoubleType), nullable = true), flat, m, c, subDim, 1e6)
    val proj = GenerateUnsafeProjection.generate(Seq(enc, lut)) // throws on Janino failure
    val vecs = Seq(
      (0 until dim).map(j => ((j * 13) % 7 - 3) / 3.0),
      (0 until dim).map(j => math.sin(j + 1.0)),
      (0 until dim - 3).map(j => j / 10.0)) // ragged tail row: slice-clamp semantics
    for (v <- vecs) {
      val row = InternalRow(new GenericArrayData(v.toArray))
      val gotCodes = proj(row).getArray(0).toIntArray().toSeq
      val gotLut = proj(row).getArray(1).toLongArray().toSeq
      val refCodes = (0 until m).map { s =>
        val xs = v.slice(s * subDim, math.min(v.size, (s + 1) * subDim))
        codebooks(s).map { case (ci, w) => (ci, SimilarityOps.cosineOf(xs, w)) }
          .sortBy { case (ci, cos) => (-cos, ci) }.head._1
      }
      val refLut = for { s <- 0 until m; (_, w) <- codebooks(s) } yield
        math.floor(SimilarityOps.dotOf(v.slice(s * subDim, math.min(v.size, (s + 1) * subDim)), w) * 1e6).toLong
      assert(gotCodes == refCodes, s"encode kernel diverged on ${v.take(4)}...")
      assert(gotLut == refLut, s"lut kernel diverged on ${v.take(4)}...")
      assert(enc.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq == gotCodes, "encode eval/codegen divergence")
      assert(lut.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq == gotLut, "lut eval/codegen divergence")
    }
  }

  test("SQ8 + sign-pack kernels compile and match interpreted eval (incl. zero/ragged rows)") {
    import graft.plans.{Sq8AdcKernel, Sq8EncodeKernel, SignPack64Kernel, ScalarQuant}
    val dim = 64
    val vecs = Seq(
      (0 until dim).map(j => math.sin(j + 1.0)),
      (0 until dim).map(j => ((j * 13) % 7 - 3) / 3.0),
      (0 until dim).map(_ => 0.0),                       // zero-norm row
      (0 until dim + 1).map(j => if (j % 3 == 0) 1.0 else -1.0), // 65 dims: 2nd pack word
      (0 until 5).map(j => j - 2.0))                     // short row vs a 64-dim query
    val q = (0 until dim).map(j => math.cos(j * 0.7))
    val qc = ScalarQuant.encodeInt8(q)
    val ref = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val enc = Sq8EncodeKernel(ref)
    val pack = SignPack64Kernel(ref)
    val proj = GenerateUnsafeProjection.generate(Seq(enc, pack)) // throws on Janino failure
    for (v <- vecs) {
      val row = InternalRow(new GenericArrayData(v.toArray))
      val gotCodes = proj(row).getArray(0).toIntArray().toSeq
      val gotPack = proj(row).getArray(1).toLongArray().toSeq
      assert(gotCodes == ScalarQuant.encodeInt8(v).map(_.toInt).toSeq,
        s"encode kernel != driver twin on dim ${v.size}")
      assert(gotPack == ScalarQuant.signPack(v).toSeq,
        s"sign-pack kernel != driver twin on dim ${v.size}")
      assert(enc.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq == gotCodes, "encode eval/codegen divergence")
      assert(pack.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq == gotPack, "pack eval/codegen divergence")
      // ADC over the encoded row against the 64-dim query's codes: exact
      // integer dot/norm, min-length dot (ragged rows clamp, norm is full)
      val codesRow = InternalRow(new GenericArrayData(gotCodes.toArray))
      val adc = Sq8AdcKernel(
        BoundReference(0, ArrayType(org.apache.spark.sql.types.IntegerType), nullable = true), qc)
      val adcProj = GenerateUnsafeProjection.generate(Seq(adc))
      val got = adcProj(codesRow).getArray(0).toLongArray().toSeq
      val refDot = gotCodes.zip(qc).map { case (c, cq) => c.toLong * cq }.sum
      val refNrm = gotCodes.map(c => c.toLong * c.toLong).sum
      assert(got == Seq(refDot, refNrm), s"ADC kernel diverged on dim ${v.size}")
      assert(adc.eval(codesRow).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq == got, "ADC eval/codegen divergence")
    }
  }

  test("MaxSim kernel compiles and matches interpreted eval (incl. zero-token, ragged)") {
    import graft.plans.{MaxSimColumns, MaxSimKernel}
    val dim = 16; val subDim = 4
    val q = (0 until dim).map(j => math.cos(j * 0.9) + 0.1)
    val qTok = MaxSimColumns.tokensOf(q, subDim).map(_.toArray).toArray
    val expr = MaxSimKernel(
      BoundReference(0, ArrayType(DoubleType), nullable = true), qTok, subDim, 1e6)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino failure
    val vecs = Seq(
      (0 until dim).map(j => math.sin(j + 0.5)),
      (0 until dim).map(_ => 0.0),                 // all-zero tokens: every pair 0
      (0 until dim - 2).map(j => j / 7.0 - 1.0),   // ragged last token
      Seq.empty[Double])                           // no tokens at all
    for (v <- vecs) {
      val row = InternalRow(new GenericArrayData(v.toArray))
      val got = proj(row).getLong(0)
      assert(expr.eval(row).asInstanceOf[Long] == got,
        s"maxsim eval/codegen divergence on dim ${v.size}")
      if (v.isEmpty) assert(got == 0L, "empty doc must score 0")
      if (v.forall(_ == 0.0) && v.nonEmpty)
        assert(got == 0L, "zero-norm tokens contribute 0 per pair")
    }
  }

  test("BloomMightContain generated code compiles, probes via references, matches eval") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(bf.putLong)
    val out = new java.io.ByteArrayOutputStream(); bf.writeTo(out)
    val expr = graft.plans.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(out.toByteArray,
        org.apache.spark.sql.types.BinaryType),
      BoundReference(0, org.apache.spark.sql.types.LongType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino failure
    for (k <- Seq(1L, 25L, 50L, 51L, 9999L)) {
      val row = InternalRow(k)
      assert(proj(row).getBoolean(0) === expr.eval(row).asInstanceOf[Boolean],
        s"codegen/interpreted divergence on $k")
      if (k <= 50L) assert(proj(row).getBoolean(0), s"false negative on member $k")
    }
  }

  test("kernels run end-to-end with codegen fallback disabled") {
    GraftFunctions.register(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = spark.range(64)
        .selectExpr(
          "graft_fnv64(concat('héé-', cast(id as string))) AS f",
          "graft_poly_fp(repeat('日本🌍', cast(id % 5 as int))) AS p")
        .collect()
      assert(rows.length === 64)
      assert(rows.map(_.getLong(0)).distinct.length === 64)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
