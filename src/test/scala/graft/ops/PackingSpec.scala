package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PackingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pack(rows: Seq[(Long, String)], c: Int) =
    Packing.packChunks(rows.toDF("doc_id", "text"), "doc_id", "text", c)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("docs pack end-to-end; one doc may span chunks, chunks may share docs") {
    // token counts: 2, 3, 4 — cumulative [0,2), [2,5), [5,9), capacity 4
    val got = pack(Seq(1L -> "a b", 2L -> "c d e", 3L -> "f g h i"), 4)
    assert(got === Seq(
      (1L, 0L, 0L, 2L, 2L), // doc1 fully in chunk 0
      (2L, 0L, 0L, 2L, 2L), // doc2 tokens 0-1 finish chunk 0
      (2L, 1L, 2L, 3L, 1L), // doc2 token 2 starts chunk 1
      (3L, 1L, 0L, 3L, 3L), // doc3 tokens 0-2 fill chunk 1
      (3L, 2L, 3L, 4L, 1L))) // doc3 token 3 starts chunk 2
  }

  test("doc spanning many whole chunks emits every chunk with full spans") {
    val words = (0 until 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val got = pack(Seq(1L -> words), 3)
    assert(got === Seq(
      (1L, 0L, 0L, 3L, 3L), (1L, 1L, 3L, 6L, 3L),
      (1L, 2L, 6L, 9L, 3L), (1L, 3L, 9L, 10L, 1L)))
  }

  test("per-doc spans reassemble the doc exactly: contiguous, complete") {
    val docs = Seq(1L -> "a b c", 2L -> "d", 3L -> "e f g h i j k", 4L -> "l m")
    val got = pack(docs, 5)
    val byDoc = got.groupBy(_._1)
    for ((id, text) <- docs) {
      val spans = byDoc(id).sortBy(_._2)
      val n = text.split(" ").length.toLong
      assert(spans.head._3 === 0L, s"doc $id starts at 0")
      assert(spans.last._4 === n, s"doc $id ends at its token count")
      spans.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 === b._3, s"doc $id spans contiguous")
          assert(b._2 === a._2 + 1, s"doc $id chunks consecutive")
        case _ =>
      }
      assert(spans.map(_._5).sum === n, s"doc $id total tokens")
    }
    // Chunk occupancy: every chunk except the last holds exactly C tokens.
    val byChunk = got.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val last = byChunk.keys.max
    byChunk.foreach { case (c, tot) =>
      if (c < last) assert(tot === 5L, s"chunk $c full") else assert(tot <= 5L)
    }
  }

  test("null text docs are skipped; empty text counts one token") {
    val got = pack(Seq(1L -> null, 2L -> "", 3L -> "x y"), 2)
    assert(got === Seq((2L, 0L, 0L, 1L, 1L), (3L, 0L, 0L, 1L, 1L),
      (3L, 1L, 1L, 2L, 1L)))
  }

  test("capacity larger than the corpus puts everything in chunk 0") {
    val got = pack(Seq(1L -> "a b", 2L -> "c"), 100)
    assert(got.map(_._2).toSet === Set(0L))
  }

  test("multi-partition corpus matches a single-pass local reference exactly") {
    // 500 docs over 4 shuffle partitions exercises the two-level scan's
    // cross-partition offsets; any inconsistency between the two range-
    // exchange consumers (offsets vs window) would shift whole spans.
    val docs = (1L to 500L).map(i => i -> ("w " * ((i % 17) + 1).toInt).trim)
    val got = pack(docs, 64)
    val expected = {
      var cum = 0L
      docs.flatMap { case (id, text) =>
        val n = text.split(" ").length.toLong
        val start = cum; cum += n
        (start / 64 to (cum - 1) / 64).map { ch =>
          val from = math.max(ch * 64 - start, 0L)
          val to = math.min((ch + 1) * 64 - start, n)
          (id, ch, from, to, to - from)
        }
      }
    }
    assert(got === expected)
    // The plan must not contain a corpus-wide unpartitioned window: the
    // only unpartitioned window runs on the per-partition subtotal rows.
    val plan = Packing.packChunks(
      docs.toDF("doc_id", "text"), "doc_id", "text", 64)
      .queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("spark_partition_id"), plan.take(500))
  }

  private def slide(rows: Seq[(Long, String)], c: Int, s: Int) =
    Packing.slidingChunks(rows.toDF("doc_id", "text"), "doc_id", "text", c, s)
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq

  test("slidingChunks overlaps by chunk - stride and covers every token") {
    // 7 tokens, chunk 4, stride 2 → starts 0, 2 (covers to 6), but 7 > 6
    // so one more start at index ceil((7-4)/2)=2... starts 0,1,2 by the
    // ceil-div: (7-4+1)/2 = 2 → starts 0..2 → windows [a..d],[c..f],[e..g]
    val got = slide(Seq(1L -> "a b c d e f g"), 4, 2)
    assert(got === Seq(
      (1L, 0, "a b c d", 4), (1L, 1, "c d e f", 4), (1L, 2, "e f g", 3)))
    // every token appears in at least one chunk
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered === "a b c d e f g".split(" ").toSet)
  }

  test("slidingChunks: short docs emit one chunk; stride == chunk tiles") {
    assert(slide(Seq(1L -> "a b"), 5, 3) === Seq((1L, 0, "a b", 2)))
    // exact multiple, no overlap: plain tiling with no phantom tail
    assert(slide(Seq(2L -> "a b c d"), 2, 2) ===
      Seq((2L, 0, "a b", 2), (2L, 1, "c d", 2)))
    // doc length == chunk: exactly one chunk, no second start
    assert(slide(Seq(3L -> "a b c"), 3, 1) === Seq((3L, 0, "a b c", 3)))
  }

  test("slidingChunks rejects bad strides and skips null text") {
    intercept[IllegalArgumentException](slide(Seq(1L -> "a"), 4, 5))
    intercept[IllegalArgumentException](slide(Seq(1L -> "a"), 4, 0))
    val withNull = Seq((1L, "a b"), (2L, null.asInstanceOf[String]))
    val got = Packing.slidingChunks(withNull.toDF("doc_id", "text"),
      "doc_id", "text", 4, 2).select($"doc_id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  // --- shardManifest ---

  private def manifestOf(df: org.apache.spark.sql.DataFrame, salt: String,
      shards: Int = 4) =
    Packing.shardManifest(df, Seq("doc_id", "chunk_id"), "n_toks",
      shards, salt)
      .orderBy($"shard_id")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("shardManifest conserves totals and matches a local md5 reference") {
    val docs = (1L to 200L).map(i => i -> ("w " * ((i % 13) + 1).toInt).trim)
    val chunks = Packing.packChunks(docs.toDF("doc_id", "text"),
      "doc_id", "text", 32)
    val rows = chunks.select($"doc_id", $"chunk_id", $"n_toks")
      .as[(Long, Long, Long)].collect().toSeq
    val got = manifestOf(chunks, "m-v1")
    // local reference: same 52-bit md5 family, sequential fold
    def h52(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(13), 16)
    }
    val expected = rows.groupBy { case (d, c, _) => h52(s"$d:$c:m-v1") % 4 }
      .map { case (sh, grp) =>
        (sh, grp.size.toLong, grp.map(_._3).sum,
          grp.map { case (d, c, _) =>
            BigInt(h52(s"$d:$c:m-v1")) }.sum.mod(BigInt(1L << 52)).toLong)
      }.toSeq.sortBy(_._1)
    assert(got === expected)
    assert(got.map(_._2).sum === rows.size.toLong)
    assert(got.map(_._3).sum === rows.map(_._3).sum)
  }

  test("shardManifest is partition-invariant and order-invariant") {
    val docs = (1L to 120L).map(i => i -> ("t " * ((i % 7) + 1).toInt).trim)
    val chunks = Packing.packChunks(docs.toDF("doc_id", "text"),
      "doc_id", "text", 16)
    val base = manifestOf(chunks, "m-v2")
    assert(manifestOf(chunks.repartition(13), "m-v2") === base)
    assert(manifestOf(chunks.orderBy($"n_toks", $"doc_id".desc), "m-v2")
      === base)
  }

  test("shardManifest checksum detects a single dropped sequence") {
    val docs = (1L to 50L).map(i => i -> "a b c")
    val chunks = Packing.packChunks(docs.toDF("doc_id", "text"),
      "doc_id", "text", 8)
    val full = manifestOf(chunks, "m-v3")
    val dropped = manifestOf(chunks.filter($"doc_id" =!= 17L), "m-v3")
    assert(full !== dropped)
    // re-salting rebalances: at least one shard's membership moves
    assert(manifestOf(chunks, "m-v3-alt") !== full)
  }

  test("shardManifest plan: map-side partial aggregation, no row explosion") {
    val docs = (1L to 60L).map(i => i -> "x y z")
    val chunks = Packing.packChunks(docs.toDF("doc_id", "text"),
      "doc_id", "text", 8)
    val plan = Packing.shardManifest(chunks, Seq("doc_id", "chunk_id"),
      "n_toks", 8, "m-v4").queryExecution.executedPlan.toString
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(800))
    intercept[IllegalArgumentException](
      Packing.shardManifest(chunks, Seq("doc_id"), "n_toks", 0, "s"))
  }
}
