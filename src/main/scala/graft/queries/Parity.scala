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

  /** round(s / n, 4) — HALF_UP, away from zero — evaluated in EXACT
    * integer arithmetic, for MEAN outputs whose quotient can land
    * exactly on a `.00005` tie. `round(double, 4)` is NOT
    * engine-portable there: Spark rounds the shortest-decimal
    * representation of the quotient (BigDecimal.valueOf), DuckDB
    * multiplies the raw double by 10⁴ — on a tie the two sit on
    * opposite sides by 1 ulp (caught live at sf0.1: 6/5000
    * docs_unigram_logprob rows off by exactly 1e-4, r8).
    *
    * Contract: `s` is an exact decimal with AT MOST 8 fractional
    * digits and |s| < 4×10¹⁰; `n` a positive integer ≤ ~10⁹. Then
    * t = s·10⁸ and d = n·10⁴ are exact longs with 2|t|+d < 2⁶³, the
    * integral division (2|t|+d) div (2d) is EXACT long arithmetic
    * (`GraftSqlShim.integralDivide` — `floor(a / b)` would route
    * through double and can round across an integer once operands pass
    * 2⁵³), and sign·((2|t|+d) div (2d)) / 10⁴ IS
    * round-half-away(s/n, 4), engine-independent (the final /10⁴ of
    * the ≤15-digit integer result is one IEEE division on both
    * engines). SQL mirror: [[exactMeanRound4Sql]] (BIGINT `//`, exact
    * over the same domain). */
  def exactMeanRound4(s: Column, n: Column): Column = {
    import org.apache.spark.sql.functions._
    // ×10⁸ via a (9,0) literal: (22,8)×(9,0) → (32,8), no precision
    // clamp — a plain long literal would be (20,0) and push Spark into
    // allowPrecisionLoss scale reduction, silently dropping digits.
    val t = (s.cast(DecimalType(22, 8)) *
      lit(100000000L).cast(DecimalType(9, 0))).cast("long")
    val d = n.cast("long") * lit(10000L)
    val mag = org.apache.spark.sql.GraftSqlShim
      .integralDivide(abs(t) * 2 + d, d * 2)
    when(t < 0, -mag).otherwise(mag).cast("double") / lit(10000.0)
  }

  /** The DuckDB replay of [[exactMeanRound4]] — one definition, so the
    * two sides cannot drift. `s`/`n` are SQL expressions (s an exact
    * decimal ≤8 dp, n a positive integer); emits a scalar expression
    * (reference `s` and `n` from a derived table to avoid
    * re-evaluating aggregates). */
  def exactMeanRound4Sql(s: String, n: String): String = {
    val t = s"CAST(CAST(($s) AS DECIMAL(22,8)) * 100000000 AS BIGINT)"
    val d = s"(CAST(($n) AS BIGINT) * 10000)"
    s"""CAST(CASE WHEN $t < 0 THEN -(((-($t))*2 + $d) // ($d*2))
       |      ELSE (($t)*2 + $d) // ($d*2) END AS DOUBLE) / 10000""".stripMargin
  }
}
