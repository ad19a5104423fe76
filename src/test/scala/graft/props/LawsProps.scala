package graft.props

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.ops.RefOps
import graft.sink.Upsert

/** Property-based laws (SURVEY §5): upsert idempotency, dedup/filter
  * containment, lossless split. Sized down (10 cases each) because every
  * case runs real Spark jobs. */
object LawsProps extends Properties("graft.laws") with SparkTestBase {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val rowGen: Gen[(Int, String)] = for {
    k <- Gen.choose(0, 20)
    v <- Gen.alphaStr.map(_.take(5))
  } yield (k, v)

  private val tableGen: Gen[List[(Int, String)]] =
    Gen.listOfN(15, rowGen)

  private def df(rows: List[(Int, String)]): DataFrame =
    rows.toDF("k", "v")

  private def canon(d: DataFrame): Set[(Int, String)] =
    d.select("k", "v").as[(Int, String)].collect().toSet

  property("upsert idempotency: upsert(upsert(T,S),S) == upsert(T,S)") =
    forAll(tableGen, tableGen) { (t, s) =>
      val target = df(t).dropDuplicates("k")
      val source = df(s)
      val once = Upsert.upsert(target, source, Seq("k"),
        winner = Some(Seq($"v")))
      val twice = Upsert.upsert(once, source, Seq("k"),
        winner = Some(Seq($"v")))
      canon(once) == canon(twice)
    }

  property("upsert result keys = target keys ∪ source keys") =
    forAll(tableGen, tableGen) { (t, s) =>
      val target = df(t).dropDuplicates("k")
      val source = df(s)
      val merged = Upsert.upsert(target, source, Seq("k"))
      val keys = merged.select("k").as[Int].collect().toSet
      keys == (t.map(_._1).toSet ++ s.map(_._1).toSet)
    }

  property("dedupByKeyFirst output ⊆ input and unique per key") =
    forAll(tableGen) { rows =>
      val deduped = RefOps.dedupByKeyFirst(Seq("k"), Seq($"v"))(df(rows))
      val got = canon(deduped)
      got.subsetOf(rows.toSet) &&
        got.groupBy(_._1).values.forall(_.size == 1)
    }

  property("riFilter output ⊆ input, keeps exactly matching keys") =
    forAll(tableGen, Gen.listOf(Gen.choose(0, 20))) { (rows, valid) =>
      val filtered = canon(RefOps.riFilter(valid.toDF("k"), "k")(df(rows)))
      filtered == rows.filter(r => valid.contains(r._1)).toSet
    }

  property("splitEven(n) then drop part_id == identity (lossless)") =
    forAll(tableGen, Gen.choose(1, 7)) { (rows, n) =>
      val split = RefOps.splitEven(n, Seq($"k", $"v"))(df(rows))
      canon(split.drop("part_id")) == rows.toSet ||
        // canon() collapses duplicate rows; compare with multiplicity:
        split.drop("part_id").as[(Int, String)].collect().sorted.toSeq ==
          rows.sorted.toSeq
    }

  property("union-of-pages invariant under page size") =
    forAll(tableGen, Gen.choose(1, 5)) { (rows, pageSize) =>
      val pages = rows.grouped(pageSize).map(p => df(p)).toSeq
      if (pages.isEmpty) true
      else RefOps.unionAll(pages).as[(Int, String)].collect().sorted.toSeq ==
        rows.sorted.toSeq
    }

  private val textGen: Gen[String] = Gen.listOfN(40,
    Gen.frequency(
      (8, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', '.', '@', ':', '/', '-')))).map(_.mkString)

  property("scrubPii is idempotent: scrub(scrub(t)) == scrub(t)") =
    forAll(Gen.listOfN(8, textGen)) { texts =>
      import graft.functions.TextFunctions.scrubPii
      val d = texts.toDF("t")
      val once = d.select(scrubPii($"t")).as[String].collect().toSeq
      val twice = d.select(scrubPii(scrubPii($"t"))).as[String].collect().toSeq
      once == twice
    }

  property("charEntropy ∈ [0, log2(distinct chars)]") =
    forAll(Gen.listOfN(6, textGen.suchThat(_.nonEmpty))) { texts =>
      import graft.functions.TextFunctions.charEntropy
      val got = texts.toDF("t")
        .select($"t", charEntropy($"t")).as[(String, Double)].collect()
      got.forall { case (t, e) =>
        val bound = math.log(t.distinct.length.toDouble) / math.log(2.0)
        e >= -1e-9 && e <= bound + 1e-9
      }
    }

  property("SCD2 reconstruction: intervals replay every version's snapshot") =
    forAll(Gen.listOfN(12, for {
      k <- Gen.choose(0, 3)
      ver <- Gen.choose(0, 30)
      v <- Gen.option(Gen.choose(0, 2).map(i => s"v$i"))
    } yield (k, ver, v.orNull))) { raw =>
      // Versions unique per key (compressHistory's contract).
      val rows = raw.groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val hist = rows.toDF("k", "ver", "v")
      val scd2 = graft.ops.Cdc.compressHistory(hist, Seq("k"), "ver", Seq("v"))
        .select($"k", $"v", $"valid_from", $"valid_to")
        .as[(Int, Option[String], Int, Option[Int])].collect()
      // For EVERY original (k, ver): exactly one interval covers it, and
      // that interval carries the value of the latest change <= ver —
      // i.e. the compacted history answers point-in-time lookups exactly.
      rows.forall { case (k, ver, v) =>
        val covering = scd2.filter { case (ik, _, from, to) =>
          ik == k && from <= ver && to.forall(ver < _)
        }
        covering.length == 1 && covering.head._2 == Option(v)
      }
    }

  property("kmv est_distinct == exact count when distinct < k") =
    forAll(Gen.listOfN(30, Gen.choose(0L, 1000L))) { keys =>
      import graft.functions.Sketches
      val d = keys.toDF("key").withColumn("g", lit("g"))
      val got = Sketches.kmvDistinct(d, $"g", $"key", k = 256)
        .select("est_distinct").as[Long].collect()
      keys.isEmpty || got.headOption.contains(keys.distinct.size.toLong)
    }

  // Pure-JVM law (no Spark jobs): the decayed-counter fold is arrival-
  // order independent up to float rounding — any permutation of the same
  // events, folded one by one, yields the same horizon-decayed score.
  // This is what makes late/out-of-order streaming delivery safe.
  // Small alphabet + short words force heavy pair sharing and count
  // ties — exactly the argmax tie-break surface where the two training
  // tiers could diverge. Corpus content is arbitrary; equality must be
  // exact (rank, pair, merged symbol AND count), per Bpe.train's
  // pure-function-of-the-corpus contract.
  property("BPE driver tier == distributed tier on random corpora") =
    forAll(Gen.listOfN(12,
      Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))) { words =>
      import graft.functions.Bpe
      val docs = Seq(words.mkString(" ")).toDF("text")
      def table(localLimit: Long) =
        Bpe.train(docs, "text", 6, minCount = 1L, localTypeLimit = localLimit)
          .as[(Int, String, String, String, Long)].collect().toSeq
      table(localLimit = 1000000L) == table(localLimit = 0L)
    }

  property("decay fold: any arrival order agrees at a shared horizon") =
    forAll(
      Gen.nonEmptyListOf(for {
        h <- Gen.choose(0, 96)           // event hour offsets within 4 days
        v <- Gen.choose(-100, 100)       // signed unit-scale values
      } yield (h.toLong * 3600000000L, v / 10.0)),
      Gen.long) { (events, seed) =>
      import graft.ops.Decay
      val hlMicros = 24.0 * 3600000000.0
      val horizon = events.map(_._1).max
      def scoreAtHorizon(order: List[(Long, Double)]): Double = {
        val (sum, n, last) = order.foldLeft(Decay.emptyState)(
          (st, e) => Decay.fold(st, e._1, e._2, hlMicros))
        assert(n == events.length.toLong)
        sum * math.pow(2.0, -(horizon - last) / hlMicros)
      }
      val shuffled = new scala.util.Random(seed).shuffle(events)
      // Tolerance: the fold rounds each decay factor at 8 decimals
      // (the r8 oracle-exactness recipe), so two orders may diverge by
      // up to ~n · 5e-9 · |running sum| — bounded well under 1e-4 at
      // this generator's scale. Exact equality is the SORTED fold's
      // contract (stream_decay's oracle), not any-order's.
      math.abs(scoreAtHorizon(events) - scoreAtHorizon(shuffled)) < 1e-4
    }

  // ---- exact-integer HALF_UP mean (the float-parity postmortem fix) ----

  // s = t·10⁻⁸ (any 8-dp decimal), n a positive count. Half the cases
  // are CONSTRUCTED exact .00005 ties — t = n·(2k+1)·5000 makes
  // s·10⁴/n = (2k+1)/2 exactly — the inputs round(double, 4) gets
  // wrong cross-engine and this helper exists for. The random range
  // deliberately exceeds 2⁵³ (up to |t| = 4×10¹⁸, near the long-space
  // bound): floor(double-division) rounds across integers out there,
  // which is why the helper uses exact integral division.
  private val meanCaseGen: Gen[(Long, Long)] = Gen.frequency(
    1 -> (for {
      t <- Gen.choose(-4000000000000000000L, 4000000000000000000L)
      n <- Gen.choose(1L, 100000L)
    } yield (t, n)),
    1 -> (for {
      n <- Gen.choose(1L, 100000L)
      k <- Gen.choose(-1000L, 1000L)
    } yield (n * (2 * k + 1) * 5000L, n)))

  property("exactMeanRound4 equals BigDecimal HALF_UP division everywhere") =
    forAll(Gen.listOfN(40, meanCaseGen)) { cases =>
      import java.math.{BigDecimal => JBD, RoundingMode}
      import org.apache.spark.sql.types.DecimalType
      val got = cases.map { case (t, n) =>
        (JBD.valueOf(t, 8).toPlainString, n) }.toDF("s", "n")
        .select(graft.queries.Parity.exactMeanRound4(
          col("s").cast(DecimalType(22, 8)), col("n")).as("m"))
        .as[Double].collect().toSeq
      val want = cases.map { case (t, n) =>
        JBD.valueOf(t, 8).divide(JBD.valueOf(n), 4, RoundingMode.HALF_UP)
          .doubleValue }
      got == want
    }

  // snapshotDiff: diff against self is empty, and swapping the snapshot
  // roles swaps 'added' and 'removed' while 'changed' is invariant.
  private val snapGen: Gen[List[(Int, String)]] =
    Gen.listOfN(12, rowGen).map(_.groupBy(_._1).map(_._2.head).toList)

  property("snapshotDiff(a, a) is empty; role swap mirrors added/removed") =
    forAll(snapGen, snapGen) { (a, b) =>
      def diff(x: List[(Int, String)], y: List[(Int, String)]) =
        graft.ops.Cdc.snapshotDiff(df(x), df(y), Seq("k"), Seq("v"))
          .as[(Int, String)].collect().toSet
      val self = diff(a, a).isEmpty
      val ab = diff(a, b)
      val ba = diff(b, a)
      def of(s: Set[(Int, String)], c: String) =
        s.collect { case (k, `c`) => k }
      self &&
        of(ab, "added") == of(ba, "removed") &&
        of(ab, "removed") == of(ba, "added") &&
        of(ab, "changed") == of(ba, "changed")
    }

  // budgetPlan: allocations never exceed capacity; the total never
  // exceeds the budget; with budget >= total capacity everything caps.
  // 12 groups deliberately exceed the default 8 capping rounds, so the
  // unconverged-plan clamp (alloc = min(share, capacity)) is exercised
  // whenever the generated cascade caps one group per round.
  private val capsGen: Gen[List[(String, Long)]] =
    Gen.listOfN(12, Gen.choose(1L, 500L))
      .map(_.zipWithIndex.map { case (c, i) => (s"g$i", c) })

  property("budgetPlan respects capacities and the budget ceiling") =
    forAll(capsGen, Gen.choose(0L, 5000L)) { (caps, budget) =>
      val plan = graft.ops.Sampling.budgetPlan(
        caps.toDF("g", "t"), col("g"), col("t"), budget, alpha = 0.5)
        .as[(String, Long, Double, Long, Boolean)].collect().toList
      val byG = plan.map(r => r._1 -> r).toMap
      val withinCaps = plan.forall(r => r._4 >= 0 && r._4 <= r._2)
      val withinBudget = plan.map(_._4).sum <= budget
      val total = caps.map(_._2).sum
      val fullyCapped = budget < total ||
        plan.forall(r => r._5 && r._4 == byG(r._1)._2)
      withinCaps && withinBudget && fullyCapped
    }

  // psiBins: bin counts conserve the (in-range + clamped) population and
  // identical inputs give all-zero drift terms.
  property("psiBins conserves counts; self-drift is zero") =
    forAll(Gen.listOfN(30, Gen.choose(-10.0, 110.0))) { vs =>
      val d = vs.toDF("v")
      val bins = graft.ops.Profiling.psiBins(d, d, col("v"), 0.0, 100.0, 5)
        .as[(Int, Long, Long, Double, Double, Double)].collect().toList
      bins.map(_._2).sum == vs.size.toLong &&
        bins.forall(r => r._2 == r._3 && r._6 == 0.0)
    }
}
