package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-decayed (half-life) aggregates — the feature-store recency
  * counter: a user's "activity score" where an event h hours old
  * contributes value · 2^(−h/halfLife). Evaluated at the corpus horizon
  * (max ts), so the score is a pure function of the data — re-runs and
  * engines agree, unlike "now()"-anchored forms.
  *
  * decayed_sum(k) = Σ_{e ∈ k} value(e) · exp(−ln2 · Δh(e) / halfLife)
  *
  * Scale shape: the horizon folds to ONE broadcast row; the decay factor
  * is a per-row projection; the aggregate is one partial-aggregable
  * groupBy on the key — a single exchange, same cost as a plain grouped
  * sum. This is the batch replay of the streaming decayed counter (state
  * = (sum, last_ts), fold on arrival): evaluating at a shared horizon
  * makes batch and incremental forms agree by the exp addition law.
  *
  * Determinism: Δh is an exact long micros difference with one double
  * division; the one libm step (exp) is rounded at 8 decimals after the
  * value multiply, summed as DECIMAL(28,10) (order-free), one final
  * round at 4 — the repo's standard oracle-exact float recipe. ln2 is a
  * literal, not a libm call, so both engines share the identical
  * constant.
  */
object Decay {

  private val Ln2 = 0.6931471805599453

  /** (key, n_events, decayed_sum) at the corpus-horizon timestamp. */
  def decayedSum(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, halfLifeHours: Double): DataFrame = {
    require(halfLifeHours > 0, s"halfLifeHours must be positive: $halfLifeHours")
    val horizon = events.agg(max(col(tsCol)).as("__t_max"))
    val dtHours = (unix_micros(col("__t_max")) - unix_micros(col(tsCol)))
      .cast(DoubleType) / lit(3600000000.0)
    val term = round(col(valCol) *
        exp(lit(-Ln2) * dtHours / lit(halfLifeHours)), 8)
      .cast(DecimalType(28, 10))
    events.crossJoin(broadcast(horizon))
      .select(col(keyCol), term.as("__dv"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__dv")).cast(DoubleType), 4).as("decayed_sum"))
  }
}
