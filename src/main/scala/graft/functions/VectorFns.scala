package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * expressed with codegen'd higher-order built-ins (`zip_with` +
  * `aggregate`) — no UDFs, so the whole similarity pipeline stays inside
  * WholeStageCodegen and distributes trivially.
  *
  * All arithmetic is done in double after an explicit cast: the fold order
  * (left-to-right over the array) is deterministic and matches DuckDB's
  * sequential list_dot_product loop, which keeps oracle comparisons exact
  * up to final rounding.
  */
object VectorFns {

  /** Cast an array<float> column to array<double>. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: left fold of pairwise products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity, computed as dot/(sqrt(n2a)*sqrt(n2b)). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Sign bits against `nPlanes` deterministic pseudo-random hyperplanes —
    * the random-hyperplane LSH family for cosine distance. Plane components
    * are ±1 derived from xxhash64(planeId, componentIdx), so executors
    * recompute identical planes with no broadcast state. Returns an int
    * bucket id in [0, 2^nPlanes). */
  def rhpBucket(v: Column, nPlanes: Int): Column = {
    require(nPlanes > 0 && nPlanes <= 30, "nPlanes must be in [1,30]")
    val bits = (0 until nPlanes).map { p =>
      // projection of v onto pseudo-plane p: sum_j v[j] * sign(hash(p, j))
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, j) =>
          x * (pmod(xxhash64(lit(p), j), lit(2)) * lit(2.0) - lit(1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
