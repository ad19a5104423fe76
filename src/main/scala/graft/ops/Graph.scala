package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link-graph analytics for corpus curation — PageRank over an edge
  * list, the standard domain-authority weight a web-corpus pipeline
  * feeds into per-domain sampling/filtering (crawl frontier scoring,
  * source reweighting).
  */
object Graph {

  /** PageRank over an edge list (one row = one edge; parallel edges act
    * as integer weights). Simplified formulation without dangling-mass
    * redistribution: a node with no out-edges leaks its mass, so ranks
    * sum to < 1 when dangling nodes exist (the common map-reduce
    * formulation; callers wanting strict conservation add self-loops).
    *
    * Deterministic across engines and partitionings: each iteration
    * sums per-edge contributions in exact DECIMAL(38,18) (order-
    * independent, unlike a double sum) and rounds the new rank once at
    * `roundScale` decimals, so the doubles entering the next iteration
    * are bit-identical anywhere — the oracle replays iterations
    * verbatim.
    *
    * Scale: per iteration, ONE shuffle of the edge list by dst (the
    * aggregate); the rank and out-degree tables are |V| rows — for a
    * domain graph that is millions of rows against billions of edges,
    * so Spark broadcasts them onto the edge scan and the big table
    * never reshuffles for the joins. Each iteration's |V|-row result is
    * localCheckpoint-pinned: iterative lazy plans otherwise nest, and
    * iteration i would re-run all i-1 prior passes per downstream
    * reference.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85,
      roundScale: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    // Driver-side doubles: (1.0 - damping) here and a decimal 1 - 0.85
    // in SQL differ in the 17th digit — the oracle must force DOUBLE
    // subtraction to match (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)).
    val teleport = (1.0 - damping) / n
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint()
    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 0 until iterations) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "__pn"), col("src") === col("__pn"))
        .join(outdeg, "src")
        .select(col("dst"),
          (col("pr") / col("od")).cast(DecimalType(38, 18)).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      pr = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(teleport) + lit(damping) *
            coalesce(col("s").cast("double"), lit(0.0)), roundScale).as("pr"))
        .localCheckpoint()
    }
    pr
  }

  /** Weakly-connected components over an edge list: returns
    * (node, component) where `component` is the minimum node id in the
    * component under Spark's ordering for the column type. Null
    * endpoints are dropped (a null cannot be min-labeled).
    *
    * Delegates to [[graft.dedup.Dedup.clusterPairs]] — near-dup
    * clustering IS connected components over the pair graph, and the
    * two call sites must keep identical semantics. That path is
    * scale-tiered: graphs under ~1M edges solve with driver-side
    * union-find in one job; larger graphs run distributed min-label
    * propagation with pointer doubling (O(log diameter) rounds, each a
    * constant number of shuffles, plans pinned per round). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 25): DataFrame =
    graft.dedup.Dedup.clusterPairs(
        edges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b")),
        maxIterations)
      .select(col("id").as("node"), col("canonical_id").as("component"))

  /** Per-node degree profile of a directed edge list: (node, out_degree,
    * in_degree) with 0 (not null) for missing directions, parallel edges
    * counted. One aggregate per direction on the edge list, then an
    * outer merge of the two |V|-row results — the edge table is never
    * joined against itself. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
