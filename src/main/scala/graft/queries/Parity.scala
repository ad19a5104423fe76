package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** The cross-engine float-parity invariant for aggregate outputs, in ONE
  * place: exact decimal aggregates are rounded to scale 2 (HALF_UP —
  * DuckDB mirrors with `round(x, 2)`) BEFORE the double cast. A decimal
  * whose scaled integer exceeds 2^53 converts to double with
  * engine-dependent 1-ulp rounding (DuckDB divides its int128 by
  * 10^scale in floating point; Java's BigDecimal rounds exactly), so
  * high-scale sums break exact hashing once totals pass ~9e7 at scale 8.
  * At scale 2 the cast is exact up to ~4.5e13. */
object Parity {
  /** Surface a decimal aggregate as an engine-independent double. */
  def roundedDouble(c: Column): Column =
    c.cast(DecimalType(38, 2)).cast("double")

  /** Exact decimal sum of a double column, surfaced as an
    * engine-independent double. The ONE definition: query modules must
    * not re-derive the precision locally, or a future precision change
    * would have to find every copy to keep Spark-vs-oracle parity. */
  def dsum(c: Column): Column = {
    import org.apache.spark.sql.functions.sum
    roundedDouble(sum(c.cast(DecimalType(18, 4))))
  }

  /** l_extendedprice * (1 - l_discount) in exact decimal — the TPC-H
    * revenue term, shared for the same single-definition reason. */
  def rev(price: Column, disc: Column): Column = {
    import org.apache.spark.sql.functions.lit
    price.cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(18, 4)) - disc.cast(DecimalType(18, 4)))
  }
}
