package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
        // Final round IN DECIMAL (HALF_UP scale-down cast) before the
        // one double cast: round(double, 4) of an exact 8-dp sum
        // splits engines on a 5e-5 tie — the Dsir/logprob postmortem
        // class (SCALING.md, r8).
        sum(col("__dv")).cast(DecimalType(28, 4)).cast(DoubleType)
          .as("decayed_sum"))
  }

  case class DecayEvent(key: Long, tsMicros: Long, value: Double,
      eventId: Long = 0L)
  case class DecayScore(key: Long, n_events: Long, decayed_sum: Double,
      at_micros: Long)

  /** The INCREMENTAL form of [[decayedSum]]: a per-key decayed counter
    * maintained across micro-batches with O(1) state per key —
    * (sum-as-of-last-event, last event micros, n). The state never holds
    * events, which is what makes the counter viable over an unbounded
    * stream: each arrival folds in by the exp addition law
    *   2^(−(H−t)/hl) = 2^(−(H−s)/hl) · 2^(−(s−t)/hl),
    * so a NEW event ahead of the state's horizon decays the running sum
    * forward, and a LATE event behind it decays the event's value back —
    * arrival order changes only float rounding, never the math
    * (spec-pinned against the batch form at a shared horizon). The typed
    * surface takes primitive values; map null values to 0.0 upstream —
    * that reproduces the batch null policy (contributes nothing, counts
    * as an event) since a 0.0 term is absorbed by the fold.
    *
    * Update mode: each batch emits the refreshed (key, n, sum, at) for
    * keys that received events; `decayed_sum` is as of that key's latest
    * event — evaluate at any common horizon H by multiplying
    * 2^(−(H−at)/hl). State is per-key in Spark's state store (scales
    * with the cluster, not the driver); production variants bound idle
    * keys with a timeout, kept out of scope here to keep the fold law
    * the whole story. The same call runs on a batch Dataset unchanged
    * (one pass per key — batch ≡ stream, like EventsOps.runningTotals).
    *
    * Determinism (r8): each batch's group folds in (tsMicros, eventId)
    * order — the iterator is materialized and sorted per key per batch,
    * bounded state since a grouped iterator is per-key-per-batch anyway
    * — and [[fold]] rounds its one libm call (pow) at 8 decimals, so
    * the result is a PURE FUNCTION of the data whenever batches arrive
    * time-ordered (trivially true for the single-batch AvailableNow
    * replay the registered query runs, and for time-partitioned file
    * arrival). That is what lets stream_decay be oracle-exact: DuckDB
    * replays the identical chain with list_reduce over the same sort.
    * Out-of-order BATCHES still obey the weaker law (arrival order
    * changes only float rounding, never the math — LawsProps). */
  def decayedSumStream(events: Dataset[DecayEvent],
      halfLifeHours: Double): Dataset[DecayScore] = {
    require(halfLifeHours > 0, s"halfLifeHours must be positive: $halfLifeHours")
    import events.sparkSession.implicits._
    val hlMicros = halfLifeHours * 3600000000.0
    events.groupByKey(_.key)
      .flatMapGroupsWithState[(Double, Long, Long), DecayScore](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[DecayEvent],
            state: GroupState[(Double, Long, Long)]) =>
          val folded = it.toArray.sortBy(e => (e.tsMicros, e.eventId))
            .foldLeft(state.getOption.getOrElse(emptyState))(
            (st, e) => fold(st, e.tsMicros, e.value, hlMicros))
          state.update(folded)
          Iterator(DecayScore(key, folded._2, folded._1, folded._3))
      }
  }

  /** Empty fold state: (decayed sum, n, last-event micros sentinel). */
  private[graft] val emptyState: (Double, Long, Long) = (0.0, 0L, Long.MinValue)

  /** One arrival folded into (sum, n, lastMicros) — the pure core of
    * [[decayedSumStream]], factored out so the order-independence law is
    * testable without a streaming harness (LawsProps).
    *
    * The decay factor (the step's ONE libm call) is rounded at 8
    * decimals immediately — the repo's standard rounded-libm recipe —
    * via the same Double.toString-based BigDecimal path Spark's own
    * `round` takes, so a DuckDB `round(pow(2.0, x), 8)` replay of the
    * sorted chain reproduces the fold bit-for-bit (the remaining
    * multiply and add are single IEEE ops, identical on both engines;
    * multiplication/addition commutativity keeps operand order
    * irrelevant). */
  private[graft] def fold(state: (Double, Long, Long), tsMicros: Long,
      value: Double, hlMicros: Double): (Double, Long, Long) = {
    val (sum, n, last) = state
    if (last == Long.MinValue) (value, n + 1, tsMicros)
    else if (tsMicros >= last)
      (sum * pow2r8(-(tsMicros - last) / hlMicros) + value,
        n + 1, tsMicros)
    else
      (sum + value * pow2r8(-(last - tsMicros) / hlMicros),
        n + 1, last)
  }

  /** 2^x rounded at 8 decimals (HALF_UP on the shortest decimal
    * representation — Spark's round semantics, matching DuckDB's). */
  private def pow2r8(x: Double): Double =
    java.math.BigDecimal.valueOf(math.pow(2.0, x))
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue
}
