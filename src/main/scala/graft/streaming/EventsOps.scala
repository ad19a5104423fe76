package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Windowed event aggregations (SURVEY §2.7 streaming extension). Each
  * function is a pure DataFrame transform, so the SAME plan runs in batch
  * (for the oracle gate) and under `readStream` with a watermark (see
  * EventsStreamingSpec) — Structured Streaming's batch/stream unification.
  */
object EventsOps {

  // NOT Parity.dsum: event values are small (unit-scale) doubles, so the
  // pinned precision here is (18,6) — matching every events_* oracle's
  // `CAST(value AS DECIMAL(18,6))` — not the (18,4) of the TPC-H money
  // columns. A precision change must update this AND those oracles.
  private def dsum(c: Column): Column =
    graft.queries.Parity.roundedDouble(sum(c.cast(DecimalType(18, 6))))

  /** Tumbling window aggregate per event type. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding window aggregate (width, slide). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Session windows per user: events closer than `gap` merge into one
    * session (Spark session_window; equivalent to gaps-and-islands SQL). */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Time-series gap fill / resample: hourly counts per event type with
    * MISSING hours emitted as zero rows — the densification step before
    * rate math, anomaly scoring, or charting (a plain groupBy silently
    * skips empty buckets). The full hour spine is generated once from
    * the global (min, max) bounds — one tiny one-row subtree — and
    * cross-joined with the distinct type set, both broadcast: the fact
    * table is aggregated exactly once and never re-scanned or shuffled
    * for the fill. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val ev = events.select(date_trunc("hour", col("ts")).as("h"),
      col("event_type"))
    val counts = ev.groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val spine = ev.groupBy().agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    // Null-safe (<=>) on event_type: a null type is a legitimate key
    // (distinct() emits it, SQL GROUP BY groups it) — an equi-join would
    // never match it and the fill would report n=0 for hours where null-
    // typed events actually occurred (an undercount, not a missing row).
    // Explicit aliases: all three frames share the `ev` lineage, so
    // unqualified references are ambiguous self-join columns.
    spine.as("s").crossJoin(broadcast(types.as("t")))
      .join(counts.as("c"),
        col("s.h") === col("c.h") &&
          (col("t.event_type") <=> col("c.event_type")),
        "left")
      .select(col("s.h").as("hour"), col("t.event_type").as("event_type"),
        coalesce(col("c.n"), lit(0L)).as("n"))
  }

  /** Rolling z-score anomaly detection: flag each event whose value sits
    * more than `threshold` sample standard deviations from the mean of
    * the same key's previous `lookback` events — the metrics-monitoring
    * shape (per-user spend spikes, per-host latency outliers) and the
    * statistical-outlier filter of a data-curation pass. The frame is
    * strictly PRIOR rows (`-lookback .. -1`): the current value never
    * contaminates its own baseline, so a genuine spike cannot mask
    * itself by inflating the window statistics it is judged against.
    *
    * Engine-exact by the repo's oracle discipline: the only
    * order-sensitive terms — Σv and Σv² over the frame — are summed as
    * decimals (exact, order-independent), converted to double once, and
    * the mean/variance/sqrt arithmetic that follows is deterministic
    * IEEE on identical inputs; z is rounded at 6 immediately after the
    * one sqrt. Rows with fewer than `minPrior` prior values (cold start)
    * or a zero-variance baseline get a NULL z and `anomaly = false` —
    * never a division-by-zero Inf/NaN leaking into downstream filters.
    *
    * Scale shape: ONE window exchange, partitioned by the key — the
    * per-key frame is a bounded `lookback`-row deque inside WindowExec,
    * so memory is O(lookback) per open key regardless of corpus size,
    * and there is no self-join (the naive formulation) or global sort.
    */
  def rollingZScore(events: DataFrame, key: Column, order: Seq[Column],
      valueCol: Column, lookback: Int = 20, minPrior: Int = 8,
      threshold: Double = 3.0): DataFrame = {
    require(lookback >= minPrior && minPrior >= 2,
      s"need lookback >= minPrior >= 2, got ($lookback, $minPrior)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order: _*).rowsBetween(-lookback, -1)
    val v = valueCol.cast(DecimalType(18, 6))
    val s1 = sum(v).over(w).cast("double")
    val s2 = sum(v * v).over(w).cast("double")
    val n = count(v).over(w).cast("double")
    val mean = s1 / n
    // Sample variance via the sum-of-squares identity; the subtraction
    // can go epsilon-negative under FP cancellation, and the > 0 guard
    // below keeps sqrt off that path in BOTH engines (same doubles).
    val variance = (s2 - s1 * s1 / n) / (n - lit(1.0))
    val z = round((valueCol - mean) / sqrt(variance), 6)
    events
      .withColumn("z",
        when(n >= lit(minPrior.toDouble) && variance > lit(0.0), z))
      .withColumn("anomaly",
        coalesce(abs(col("z")) > lit(threshold), lit(false)))
  }

  /** `value` is boxed so a NULL value row — which the batch form
    * handles (z = NULL, anomaly = false, and the row never enters any
    * later frame: SUM/COUNT skip nulls) — flows through the typed
    * stream instead of crashing the encoder. */
  case class ZEvent(event_id: Long, user_id: Long, tsMicros: Long,
    value: java.lang.Double)
  case class ZFlag(event_id: Long, user_id: Long, value: java.lang.Double,
    z: Option[Double], anomaly: Boolean)

  /** Streaming form of [[rollingZScore]]: the same per-key prior-frame
    * judgment maintained across micro-batches with flatMapGroupsWithState
    * — the live-alerting leg of the anomaly detector. State per key is
    * the last `lookback` values (bounded by construction, the O(lookback)
    * claim of the batch plan made literal); each arrival is judged
    * against the state BEFORE it enters, preserving the batch form's
    * strictly-prior law. Events are sorted by (ts, event_id) WITHIN each
    * batch's group iterator; cross-batch order is the source's
    * responsibility (same in-order-per-key contract as
    * [[graft.ops.Decay.decayedSumStream]]'s at-horizon law). Append mode:
    * a row's verdict is final the moment it is emitted.
    *
    * Batch ≡ stream: [[zScoreOf]] reproduces the window plan's
    * arithmetic digit for digit (valueOf-based decimal scaling, the same
    * IEEE expression order, round-at-6), so in-order delivery yields
    * EXACTLY the batch output — pinned by RollingZScoreSpec.
    */
  def rollingZScoreStream(events: Dataset[ZEvent], lookback: Int = 20,
      minPrior: Int = 8, threshold: Double = 3.0): Dataset[ZFlag] = {
    require(lookback >= minPrior && minPrior >= 2,
      s"need lookback >= minPrior >= 2, got ($lookback, $minPrior)")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Vector[Double], ZFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[ZEvent], state: GroupState[Vector[Double]]) =>
          var window = state.getOption.getOrElse(Vector.empty[Double])
          val out = it.toVector.sortBy(e => (e.tsMicros, e.event_id)).map { e =>
            // NULL value: the batch window plan gives the row z = NULL /
            // anomaly = false and EXCLUDES it from every later frame
            // (decimal SUM and COUNT(value) skip nulls) — mirror both.
            if (e.value == null) ZFlag(e.event_id, uid, null, None, false)
            else {
              val (z, anomaly) = zScoreOf(window, e.value, minPrior, threshold)
              window = (window :+ e.value.doubleValue).takeRight(lookback)
              ZFlag(e.event_id, uid, e.value, z, anomaly)
            }
          }
          state.update(window)
          out.iterator
      }
  }

  /** One value judged against its prior frame — the pure core of
    * [[rollingZScoreStream]], factored out so the batch-equality law is
    * testable without a streaming harness. Replicates the batch window
    * plan's arithmetic exactly: values scaled to decimal(·,6) via
    * valueOf (Spark's double→decimal cast path), exact decimal Σv and
    * Σv², ONE conversion to double, then the identical IEEE
    * mean/variance/sqrt expression and a HALF_UP round at 6 — the same
    * doubles Catalyst produces, so streamed flags equal batch flags. */
  private[graft] def zScoreOf(prior: Seq[Double], x: Double,
      minPrior: Int, threshold: Double): (Option[Double], Boolean) = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val n = prior.size
    if (n < minPrior) return (None, false)
    val decs = prior.map(v => JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP))
    val s1 = decs.foldLeft(JBD.ZERO)(_.add(_)).doubleValue
    val s2 = decs.foldLeft(JBD.ZERO)((a, d) => a.add(d.multiply(d))).doubleValue
    val nd = n.toDouble
    val variance = (s2 - s1 * s1 / nd) / (nd - 1.0)
    if (!(variance > 0.0)) (None, false)
    else {
      val z = JBD.valueOf((x - s1 / nd) / math.sqrt(variance))
        .setScale(6, RoundingMode.HALF_UP).doubleValue
      (Some(z), math.abs(z) > threshold)
    }
  }

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state beyond windowed aggregation (SURVEY §2.7): a
    * per-user running total maintained across micro-batches with
    * flatMapGroupsWithState. Update mode: each batch emits the new totals
    * for users that received events. State is unbounded by design here;
    * production variants bound it with a timeout. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[(Long, Double)]) =>
          val (n0, t0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var t = t0
          it.foreach { e => n += 1; t += e.value }
          state.update((n, t))
          Iterator(UserTotals(uid, n, t))
      }
  }

  /** Interval (stream-stream) join: pair each left row with right rows of
    * the same key whose timestamp falls in [leftTs, leftTs + maxDelay] —
    * the view→click attribution shape. The time bound lives IN the join
    * condition, which is what lets Structured Streaming bound both sides'
    * state by the watermark + interval (the canonical stream-stream join
    * pattern); in batch, Catalyst plans the same expression as a hash
    * equi-join on the key with the range as a residual filter — never a
    * nested loop. Non-key column names must be disjoint (rename first).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, maxDelay: String): DataFrame = {
    graft.ops.Intervals.validate("intervalJoin maxDelay", maxDelay)
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, overlapping: ${overlap.mkString(", ")}")
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r, col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $maxDelay"))
      .select(Seq(col(s"l.$key").as(key)) ++
        left.columns.filterNot(_ == key).map(c => col(s"l.$c")) ++
        right.columns.filterNot(_ == key).map(c => col(s"r.$c")): _*)
  }

  /** The streaming form of [[tumbling]]: watermarked for state eviction.
    * Late data beyond the watermark is dropped — the explicit policy
    * (SURVEY §7 risk note). */
  def tumblingStream(events: DataFrame, width: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** The streaming form of [[sessions]]: watermarked session windows in
    * the state store — Spark merges windows closer than `gap` as events
    * arrive and emits a session once the watermark passes its end
    * (append semantics: each session exactly once, when no event can
    * extend it anymore). Identical aggregation expression to the batch
    * form, so batch ≡ stream digit-for-digit on the same data — the
    * stream_session query gates the streamed output against the BATCH
    * query's DuckDB oracle. Late data beyond the watermark is dropped
    * (the explicit policy, SURVEY §7 risk note). */
  def sessionsStream(events: DataFrame, gap: String,
      watermark: String): DataFrame =
    sessions(events.withWatermark("ts", watermark), gap)

  /** Stream-static enrichment: each micro-batch of the event stream
    * joins a STATIC dimension on `key` — the standard streaming lookup
    * (user → profile, shop → metadata). Stateless: Spark plans a
    * per-batch broadcast hash join when the dimension is small (the
    * `broadcast` hint makes it unconditional), so the stream side never
    * shuffles and no watermark/state is needed. Left join: events with
    * no dimension row pass through with nulls (dropping them silently
    * is an availability bug at ingest time — filter downstream if
    * wanted). The same call works on a batch `events` DataFrame
    * unchanged (batch ≡ stream semantics, like [[tumbling]]).
    *
    * SIZE CONTRACT (enforced, r9 verdict): the broadcast hint ships the
    * whole dimension to the driver and every executor each batch, so a
    * large `dim` means a driver OOM, not a slow job. The call probes
    * `dim` with a row-bounded scan (`limit(maxDimRows+1).count()` —
    * CollectLimit stops reading at the bound, so the probe's cost is
    * capped regardless of the dimension's true size) and fails loudly
    * above `maxDimRows`, pointing at [[enrichStreamShuffled]]. The
    * default bound (10M rows) is the order where a broadcast table
    * stops being a clear win on a 1000-executor cluster; callers with
    * wide rows should pass a lower bound. */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String,
      maxDimRows: Long = 10_000_000L): DataFrame = {
    val overlap = events.columns.toSet.intersect(dim.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, overlapping: ${overlap.mkString(", ")}")
    // The probe needs maxDimRows + 1 to fit an Int limit(): above
    // Int.MaxValue - 1 the +1 would overflow (Long.MaxValue → negative)
    // or the Int cap would silently make the guard unenforceable — and
    // a >2^31-row broadcast dimension is nonsense anyway, so reject the
    // bound itself rather than vacuously passing the dimension.
    require(maxDimRows > 0 && maxDimRows < Int.MaxValue.toLong,
      s"enrichStream: maxDimRows must be in (0, ${Int.MaxValue}) — got " +
      s"$maxDimRows; a dimension near 2^31 rows is never broadcastable, " +
      "use enrichStreamShuffled")
    val probeRows = (maxDimRows + 1).toInt
    require(dim.limit(probeRows).count() <= maxDimRows,
      s"enrichStream: dimension exceeds $maxDimRows rows — broadcasting " +
      "it would OOM the driver/executors; use enrichStreamShuffled (or " +
      "raise maxDimRows if the rows are narrow and you mean it)")
    events.join(broadcast(dim), Seq(key), "left")
  }

  /** The large-dimension form of [[enrichStream]]: identical left-join
    * semantics with NO broadcast hint, so Spark shuffles the dimension
    * and plans a sort-merge/shuffled-hash join per micro-batch. Costs a
    * dim shuffle every batch — correct at any dimension size, never the
    * fast path for a small one (use [[enrichStream]] there). */
  def enrichStreamShuffled(events: DataFrame, dim: DataFrame,
      key: String): DataFrame = {
    val overlap = events.columns.toSet.intersect(dim.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, overlapping: ${overlap.mkString(", ")}")
    events.join(dim, Seq(key), "left")
  }
}
