package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object NumFns {

  /** Truncate a double to `d` decimals as `floor(x * 10^d) / 10^d`.
    *
    * Used instead of round() on every oracle-compared double: Spark's
    * round() goes through an exact BigDecimal HALF_UP while DuckDB computes
    * std::round(x*10^d)/10^d — near a tie the two can land one ulp apart
    * (observed: 0.5963 vs 0.5962). floor-of-product is the same primitive
    * sequence in both engines, so bit-identical inputs give bit-identical
    * outputs. */
  def floorAt(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(c * lit(p)) / lit(p)
  }
}
