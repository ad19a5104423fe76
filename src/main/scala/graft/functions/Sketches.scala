package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** Distinct-count sketches for corpus profiling at 100 TB scale, built on
  * a deterministic md5-derived hash family so results are reproducible
  * across runs/partitionings AND replayable by any engine with md5 (the
  * correctness oracle re-derives them in SQL).
  *
  * Two sketches, two trade-offs:
  *  - KMV (k minimum values): keep the k smallest distinct hash values
  *    per group; estimate = (k-1) / fraction-of-hash-space they span.
  *    One top-k pass (our [[TopK]] bounded-heap operator — partial heaps
  *    per partition, no full sort), exact integer arithmetic end-to-end.
  *  - HyperLogLog bucket table: bucket by the hash's low bits, keep the
  *    max leading-zero run of the rest. Build is ONE partial-aggregable
  *    groupBy (constant state per group — the 100 TB path); buckets from
  *    disjoint shards merge by element-wise max, which is why this is
  *    the sketch warehouses actually ship.
  *
  * Neither uses floating point until the final estimate, so sketch
  * CONTENTS (the oracle-checked part) are engine-exact.
  */
object Sketches {

  /** 52-bit uniform hash of (key, salt) — the same md5-prefix family as
    * [[graft.ops.Sampling]]: 13 hex digits fit a long exactly and the
    * oracle replays it as ('0x'||substr(md5(s),1,13))::BIGINT. */
  def hash52(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 13),
      16, 10).cast("long")

  val HashSpace: Long = 1L << 52

  /** Uniform [0, 1) double from an arbitrary pre-salted string column —
    * the 52-bit family above without the (key, salt) shape, for callers
    * that hash structured coordinates (e.g. LSH plane components). ONE
    * definition: the digit count and 2^52 divisor must never drift from
    * [[hash52]]/[[HashSpace]], or oracle-replayed hashes shift. */
  def unit52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("double") /
      lit(HashSpace.toDouble)

  /** KMV distinct-count estimate of `key` per `group`.
    *
    * Output: (group, n_kept, kth_hash, est_distinct). For groups with
    * fewer than k distinct hashes the estimate IS the exact count
    * (standard KMV small-set rule). Estimate arithmetic stays in longs:
    * (k-1) * 2^52 / kth — (k-1) <= 2^11 keeps the product under 2^63.
    */
  def kmvDistinct(df: DataFrame, group: Column, key: Column, k: Int = 256,
      salt: String = "kmv"): DataFrame = {
    require(k > 1 && k <= 2048, "k must be in (1, 2048]")
    // null keys hash to null; treat them as absent (a null would sort
    // first and poison the k-th value).
    // Spread BEFORE the digest (r14, guide §2.5): the per-row md5 is
    // this sketch's dominant cost and otherwise runs single-task on an
    // unsplittable scan; only (group, key) cross the narrow exchange.
    // Measured 0.69× at sf0.1; no-op once the input scan splits.
    val hashed = graft.util.Spread
      .spreadInput(df.select(group.as("group"), key.as("__k")), col("__k"))
      .select(col("group"), hash52(col("__k"), salt).as("__h"))
      .where(col("__h").isNotNull).distinct()
    val topk = TopK.perKey(hashed, Seq(col("group")), Seq(col("__h").asc), k)
    topk.groupBy(col("group"))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("kth_hash"))
      .select(col("group"), col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * ${HashSpace}L) div kth_hash"))
          .as("est_distinct"))
  }

  /** Materialized per-group KMV sketch: the k smallest distinct hashes as
    * a sorted array — the form a warehouse persists per shard/day and
    * merges later. */
  def kmvSketch(df: DataFrame, group: Column, key: Column, k: Int = 256,
      salt: String = "kmv"): DataFrame = {
    require(k > 1 && k <= 2048, "k must be in (1, 2048]")
    val hashed = df.select(group.as("group"), hash52(key, salt).as("__h"))
      .where(col("__h").isNotNull).distinct() // null keys are absent
    TopK.perKey(hashed, Seq(col("group")), Seq(col("__h").asc), k)
      .groupBy(col("group"))
      .agg(array_sort(collect_list(col("__h"))).as("hashes"))
  }

  /** Merge sketch tables (same k and salt): sketches of DISJOINT or
    * overlapping shards combine into the sketch of their union — union
    * the kept hashes, dedupe, keep the k smallest. This is what makes
    * KMV additive across partitions/days without touching raw data. */
  def kmvMerge(sketches: DataFrame, k: Int = 256): DataFrame = {
    val exploded = sketches
      .select(col("group"), explode(col("hashes")).as("__h")).distinct()
    TopK.perKey(exploded, Seq(col("group")), Seq(col("__h").asc), k)
      .groupBy(col("group"))
      .agg(array_sort(collect_list(col("__h"))).as("hashes"))
  }

  /** Fold a sketch table into the same (n_kept, kth_hash, est_distinct)
    * shape [[kmvDistinct]] produces directly. */
  def kmvEstimate(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch.select(col("group"), size(col("hashes")).cast("long").as("n_kept"),
        element_at(col("hashes"), size(col("hashes"))).as("kth_hash"))
      .select(col("group"), col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * ${HashSpace}L) div kth_hash"))
          .as("est_distinct"))

  /** Pairwise distinct-set overlap from KMV sketches (the set-operation
    * face of KMV, cf. Beyer et al. 2007): for every unordered group
    * pair, estimate |A ∪ B| from the k smallest hashes of the combined
    * sketch, the Jaccard similarity as the fraction of that combined
    * sketch present in BOTH sides, and |A ∩ B| as their product — "how
    * many distinct documents do these two sources share" without ever
    * joining the raw data. When the union fits under k the sketch IS the
    * distinct set and every output is exact.
    *
    * Input is a [[kmvSketch]] table (group, hashes): one row per group,
    * arrays of ≤ k. The pair join is over |groups| ROWS, not corpus rows
    * — at 100 TB the corpus was already reduced to its sketches by the
    * one aggregate in kmvSketch, and this is driver-scale array
    * arithmetic kept distributed only for composability. The only
    * doubles are the final ratio·union products (IEEE-identical in any
    * engine); everything upstream is exact integer hashes. */
  def kmvPairOverlap(sketches: DataFrame, k: Int = 256): DataFrame = {
    require(k > 1 && k <= 2048, "k must be in (1, 2048]")
    val a = sketches.select(col("group").as("group_a"), col("hashes").as("__ha"))
    val b = sketches.select(col("group").as("group_b"), col("hashes").as("__hb"))
    val both = a.join(b, col("group_a") < col("group_b"))
      .withColumn("__hu",
        slice(array_sort(array_union(col("__ha"), col("__hb"))), 1, k))
      .withColumn("__nu", size(col("__hu")).cast("long"))
      .withColumn("__shared",
        size(array_intersect(col("__hu"),
          array_intersect(col("__ha"), col("__hb")))).cast("long"))
    both.select(col("group_a"), col("group_b"),
        col("__nu").as("n_kept"), col("__shared").as("n_shared"),
        when(col("__nu") < k, col("__nu"))
          .otherwise(expr(s"(${k - 1}L * ${HashSpace}L) div element_at(__hu, -1)"))
          .as("est_union"))
      .withColumn("est_intersection",
        round(col("n_shared").cast("double") / col("n_kept")
          * col("est_union")).cast("long"))
  }

  /** 28-bit md5 base digest of (key:salt), digested ONCE per input row;
    * the d per-hash-function values derive from it with the affine
    * universal family [[affineSlot]] — the same prepare/slot split as
    * `Dedup.MinHashFamily`, which is what keeps multi-hash sketches at
    * ONE digest per row instead of d (measured 6.8 s -> ~2 s on the CMS
    * build at sf0.1). Oracle form:
    * ('0x'||substr(md5(CAST(key AS VARCHAR)||':'||salt),1,7))::BIGINT */
  def base28(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))),
      1, 7), 16, 10).cast("long")

  /** Hash function j of the affine universal family over a [[base28]]
    * digest: (a_j * base + j) mod 2^31-1, a_j = (2654435761 * (j+1))
    * mod 2^30 + 1 (Knuth's multiplier; any nonzero a mod a prime is a
    * valid family member). a <= 2^30 and base < 2^28 keep every product
    * far under 2^63 — no overflow in any ANSI engine. */
  def affineSlot(base: Column, j: Column): Column =
    (((lit(2654435761L) * (j.cast("long") + lit(1L))) % lit(1073741824L)
      + lit(1L)) * base + j.cast("long")) % lit(2147483647L)

  /** Count-min sketch build: a d×w matrix of exact integer counts,
    * cell (j, h_j(key) mod w) += 1. ONE partial-aggregable groupBy with
    * d·w bounded state — the 100 TB path — and sketches of disjoint
    * shards merge by cell-wise SUM (see [[cmsMerge]]). Pure integer
    * arithmetic on the md5-affine family (one digest per row, d affine
    * slots): reproducible under any partitioning and replayable by the
    * SQL oracle. Null keys are absent.
    * Output: (row, col, cnt) for occupied cells. */
  def countMin(df: DataFrame, key: Column, d: Int = 4, w: Int = 1024,
      salt: String = "cms"): DataFrame = {
    require(d >= 1 && d <= 8, "d must be in [1, 8]")
    require(w >= 16, "w must be >= 16")
    // Spread before the md5 digest (r14, guide §2.5) — one narrow
    // column crosses; measured 0.55× at sf0.1 (sketch_cms_probe).
    graft.util.Spread
      .spreadInput(df.select(key.as("__k")).where(col("__k").isNotNull),
        col("__k"))
      .select(base28(col("__k"), salt).as("__b"))
      .select(posexplode(transform(sequence(lit(0), lit(d - 1)),
        j => pmod(affineSlot(col("__b"), j), lit(w)))).as(Seq("row", "col")))
      .groupBy(col("row"), col("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of shard sketches (same d, w, salt) = the sketch of
    * the shard union — CMS is a linear sketch. */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("row"), col("col")).agg(sum(col("cnt")).as("cnt"))

  /** Point lookups against a CMS: est(key) = min over rows j of
    * cell(j, h_j(key)) — the classic one-sided estimate (never below the
    * true count). `probes` carries one `key` column; absent cells count
    * as zero. The sketch is broadcast: probing never shuffles it. */
  def cmsLookup(sketch: DataFrame, probes: DataFrame, d: Int = 4,
      w: Int = 1024, salt: String = "cms"): DataFrame = {
    val cells = probes.select(col("key"), base28(col("key"), salt).as("__b"))
      .select(col("key"),
        posexplode(transform(sequence(lit(0), lit(d - 1)),
          j => pmod(affineSlot(col("__b"), j), lit(w)))).as(Seq("row", "col")))
    cells.join(broadcast(sketch), Seq("row", "col"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Bloom filter build: the distinct set-bit positions of a (m, k)
    * filter over `key` — position p_j(key) = h_j(key) mod m for
    * j < numHashes. Emitted as a sorted position array (the portable,
    * oracle-checkable form; pack to long words at persist time if
    * desired). Filters of shards merge by position-set UNION — Bloom is
    * an OR-mergeable sketch. Bounded state: ≤ m positions. */
  def bloomBuild(df: DataFrame, key: Column, m: Int = 8192,
      numHashes: Int = 3, salt: String = "bloom"): DataFrame = {
    require(numHashes >= 1 && numHashes <= 8, "numHashes must be in [1, 8]")
    df.select(key.as("__k")).where(col("__k").isNotNull)
      .select(base28(col("__k"), salt).as("__b"))
      .select(explode(transform(sequence(lit(0), lit(numHashes - 1)),
        j => pmod(affineSlot(col("__b"), j), lit(m)))).as("pos"))
      .distinct()
      .groupBy()
      .agg(array_sort(collect_list(col("pos"))).as("positions"))
  }

  /** Membership tests against a built filter: maybe_member is true iff
    * ALL k positions of the probe key are set (no false negatives; false
    * positives at the standard (1-e^{-kn/m})^k rate). The one-row filter
    * is broadcast. */
  def bloomContains(filter: DataFrame, probes: DataFrame, m: Int = 8192,
      numHashes: Int = 3, salt: String = "bloom"): DataFrame =
    probes.select(col("key"), base28(col("key"), salt).as("__b"))
      .crossJoin(broadcast(filter))
      .select(col("key"), (0 until numHashes)
        .map(j => array_contains(col("positions"),
          pmod(affineSlot(col("__b"), lit(j)), lit(m))))
        .reduce(_ && _).as("maybe_member"))

  /** Hash-sampled quantiles: a bottom-k-by-hash uniform sample per group
    * (the KMV trick applied to ROWS instead of distinct keys), then exact
    * lower-nearest-rank quantiles of `value` within the sample.
    *
    * Unlike GK/KLL sketches — whose state depends on merge order — the
    * bottom-k sample is a pure function of the data: the k rows with the
    * smallest hashes win no matter how the input is partitioned, so the
    * result is reproducible anywhere and replayable by the SQL oracle.
    * Collection is one [[TopK]] bounded-heap pass (partial heaps per
    * partition, k·|groups| rows shuffled — never the data); standard
    * uniform-sample quantile error O(1/sqrt(k)).
    *
    * `id` must identify rows uniquely (hash input); `value` passes
    * through untouched (no float arithmetic on it — the quantile is an
    * order statistic, exact for the oracle). Output: (group, q, value)
    * with value = sorted_sample[floor(q * (n-1))], n = sample size. */
  def hashQuantiles(df: DataFrame, group: Column, id: Column, value: Column,
      qs: Seq[Double], k: Int = 1024, salt: String = "quant"): DataFrame = {
    require(k > 1, "k must be > 1")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val hashed = df
      .select(group.as("group"), hash52(id, salt).as("__h"), value.as("__v"))
      .where(col("__h").isNotNull && col("__v").isNotNull)
    // __v as a secondary sort key makes hash-collision ties deterministic.
    val sample = TopK.perKey(hashed, Seq(col("group")),
      Seq(col("__h").asc, col("__v").asc), k)
    val arr = sample.groupBy(col("group"))
      .agg(array_sort(collect_list(col("__v"))).as("__vs"),
        count(lit(1)).as("__n"))
    arr.select(col("group"), col("__vs"), col("__n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .select(col("group"), col("q"),
        element_at(col("__vs"),
          (floor(col("q") * (col("__n") - 1)) + 1).cast("int")).as("value"))
  }

  /** HLL bucket table: (group, bucket, max_rho) with 2^p buckets.
    * bucket = low p bits of the hash; rho = leading-zero run of the
    * remaining (52-p)-bit value, + 1. Pure integer arithmetic (bit length
    * via the base-2 string — no libm), partial-aggregable max. */
  def hllBuckets(df: DataFrame, group: Column, key: Column, p: Int = 6,
      salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 14, "p must be in [4, 14]")
    val m = 1 << p
    val rest = 52 - p
    val h = hash52(col("__k"), salt)
    val v = (h / m).cast("long") // hash is non-negative: / == floor div
    val rho = when(v === 0, lit(rest + 1))
      .otherwise(lit(rest + 1) - length(conv(v, 10, 2)))
    // Spread before the md5 digest (r14, guide §2.5): measured 0.71×
    // at sf0.1 (sketch_hll_buckets); no-op once the input scan splits.
    graft.util.Spread
      .spreadInput(df.select(group.as("group"), key.as("__k")), col("__k"))
      .select(col("group"), pmod(h, lit(m)).as("bucket"), rho.as("__rho"))
      .where(col("bucket").isNotNull) // null keys are absent, not a bucket
      .groupBy(col("group"), col("bucket"))
      .agg(max(col("__rho")).cast("int").as("max_rho"))
  }

  /** Fold a bucket table into the HLL cardinality estimate (with the
    * standard small-range linear-counting correction). Floating point —
    * accuracy is pinned by tolerance tests, not the exact-hash oracle. */
  def hllEstimate(buckets: DataFrame, p: Int = 6): DataFrame = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // Groups may have absent buckets (no key hashed there): they
    // contribute 2^0 = 1 to the harmonic sum and are the zero-registers.
    // Present buckets are NEVER zero-registers — hllBuckets' rho is
    // always >= 1 — so zeros is exactly m - (#present buckets).
    buckets.groupBy(col("group"))
      .agg(sum(pow(lit(2.0), -col("max_rho"))).as("__s"),
        count(lit(1)).as("__nb"))
      .select(col("group"), {
        val zeros = lit(m) - col("__nb")
        val harm = col("__s") + (lit(m) - col("__nb")) * lit(1.0)
        val raw = lit(alpha * m * m) / harm
        when(raw <= lit(2.5 * m) && zeros > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / zeros)))
          .otherwise(round(raw)).cast("long").as("est_distinct")
      })
  }
}
