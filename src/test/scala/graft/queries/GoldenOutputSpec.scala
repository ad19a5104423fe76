package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Golden-output regression pins. Originally for the deliberately
  * oracle-free queries (the driver's DuckDB gate recorded only a
  * rows-only check for them, which a silent semantic drift could hide
  * behind); as of r8 only `dedup_minhash_fast` remains oracle-free
  * (the xxhash64 family has no DuckDB twin) — `text_bpe_merges`,
  * `text_bpe_segments` and `dedup_semantic_trained` graduated to
  * oracle-exact, and their goldens stay as a second, offline pin (the
  * bpe merge golden is also the FIXED config table the segments oracle
  * applies). The full sf0.01 result is pinned line by line against a
  * committed fixture.
  *
  * Regeneration (ONLY after an intended semantic change, with the new
  * output reviewed): re-run with GRAFT_REGEN_GOLDENS=1 in the
  * environment, then commit the diff.
  */
class GoldenOutputSpec extends AnyFunSuite with SparkTestBase {

  // Goldens live on the MAIN classpath: the text_bpe_segments DuckDB
  // oracle is generated from the committed merge-table golden at
  // SparkEntry.oracleSql construction time, which runs from `runMain
  // graft.Verify` (main classpath only).
  private val goldenDir = "src/main/resources/goldens"
  private val sf001 = "/root/testdata/sf0.01"

  /** Canonical text form: one tab-separated line per row in the query's
    * own (total) output order. Doubles render via Double.toString —
    * the shortest round-trip IEEE form, deterministic for identical
    * bits, so a single-ulp drift anywhere shows as a diff. */
  private def render(df: DataFrame): String = {
    val cols = df.schema.fieldNames.mkString("\t")
    val body = df.collect().map { row =>
      (0 until row.length).map { i =>
        val v = row.get(i)
        if (v == null) "\\N"
        else v match {
          case a: Array[_] => a.mkString("[", ",", "]")
          case s: Seq[_] => s.mkString("[", ",", "]")
          case other => other.toString
        }
      }.mkString("\t")
    }.mkString("\n")
    s"$cols\n$body\n"
  }

  private def checkGolden(query: String): Unit = {
    val got = render(SparkEntry.queries(query)(spark, sf001))
    val path = Paths.get(goldenDir, s"$query.sf0.01.tsv")
    if (sys.env.contains("GRAFT_REGEN_GOLDENS")) {
      Files.createDirectories(path.getParent)
      Files.write(path, got.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $path (${got.linesIterator.size} lines)")
    } else {
      assert(Files.exists(path),
        s"missing golden $path — run once with GRAFT_REGEN_GOLDENS=1")
      val want = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      // Compare line counts first for a readable failure, then exact text.
      assert(got.linesIterator.size == want.linesIterator.size,
        s"$query row count drifted: got ${got.linesIterator.size - 1} " +
          s"rows, golden has ${want.linesIterator.size - 1}")
      val diffs = got.linesIterator.zip(want.linesIterator).zipWithIndex
        .collect { case ((g, w), i) if g != w => s"line $i:\n  got    $g\n  golden $w" }
        .take(5).toSeq
      assert(diffs.isEmpty, s"$query drifted from golden:\n${diffs.mkString("\n")}")
    }
  }

  test("dedup_semantic_trained matches its committed sf0.01 golden") {
    checkGolden("dedup_semantic_trained")
  }

  test("dedup_minhash_fast matches its committed sf0.01 golden") {
    checkGolden("dedup_minhash_fast")
  }

  test("dedup_semantic_trained_fast matches its committed sf0.01 golden") {
    // The PRODUCTION (xxhash64/float) flavor — oracle-free like
    // dedup_minhash_fast, so the golden is its determinism pin; its
    // oracle-exact replayable sibling is the correctness pin.
    checkGolden("dedup_semantic_trained_fast")
  }

  test("text_bpe_merges matches its committed sf0.01 golden") {
    // Oracle-free because the per-iteration data-dependent argmax is
    // not one SQL statement; the golden pins the full 20-merge table.
    checkGolden("text_bpe_merges")
  }

  test("text_bpe_segments matches its committed sf0.01 golden") {
    checkGolden("text_bpe_segments")
  }
}
