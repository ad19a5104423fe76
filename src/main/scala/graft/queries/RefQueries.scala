package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.RefOps
import graft.sink.Upsert

/** The reference's operator surface (SURVEY §2), re-expressed over the
  * driver fixtures so every operator is oracle-checkable. Each query is the
  * smallest honest exercise of its operator; names carry the SURVEY ids.
  *
  * Every query ends in a deterministic total ORDER BY (mirrored in the
  * oracle SQL) so the driver's hash compare cannot be order-sensitive.
  */
object RefQueries extends graft.QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P1-P3: projection by explicit name list.
    "ref_p1_projection" -> { (s, dir) =>
      RefOps.project(Seq("c_custkey", "c_name", "c_acctbal"))(
        Tables.customer(s, dir)).orderBy(col("c_custkey"))
    },

    // P4/P5: literal tag column on a batch.
    "ref_p4_tag_literal" -> { (s, dir) =>
      RefOps.tagLit("category", "thoi-trang-nu")(
        Tables.region(s, dir)).orderBy(col("r_regionkey"))
    },

    // P7: strip the .html suffix (detail-URL key build, etl.py:91).
    "ref_p7_strip_suffix" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          RefOps.stripHtmlSuffix(concat(col("p_name"), lit(".html")))
            .as("url_key"))
        .orderBy(col("p_partkey"))
    },

    // P8: strict dd/MM/yyyy day-first date parse (etl.py:164-166),
    // round-tripped through a formatted string so the parse is exercised.
    // The parse sits ABOVE the output sort: the range partitioner's
    // sampling pass re-executes the sort's child, so any expression below
    // the sort runs twice (measured 1.7 s -> 1.1 s at sf0.1).
    "ref_p8_date_parse" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "dd/MM/yyyy").as("__s"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          RefOps.parseVnDate(col("__s")).as("ship_day"))
    },

    // P9: referential-integrity semi-join filter (etl.py:251).
    "ref_p9_ri_semijoin" -> { (s, dir) =>
      val validOrders = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      RefOps.riFilter(validOrders, "l_orderkey")(Tables.lineitem(s, dir))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // U1/U2: n-ary UNION ALL of page batches.
    "ref_u1_union_pages" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
      val pages = Seq(
        o.filter(col("o_orderkey") % 3 === 0),
        o.filter(col("o_orderkey") % 3 === 1),
        o.filter(col("o_orderkey") % 3 === 2))
      RefOps.unionAll(pages).orderBy(col("o_orderkey"))
    },

    // U3: deterministic keep-first dedup (earliest order per customer).
    "ref_u3_dedup_first" -> { (s, dir) =>
      RefOps.dedupByKeyFirst(Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))(Tables.orders(s, dir))
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy(col("o_custkey"))
    },

    // U4: distinct union of key sets (DB keys ∪ run keys, etl.py:250).
    "ref_u4_distinct_union" -> { (s, dir) =>
      RefOps.distinctKeys("c_custkey")(
        Tables.customer(s, dir),
        Tables.orders(s, dir).withColumnRenamed("o_custkey", "c_custkey"))
        .orderBy(col("c_custkey"))
    },

    // U5: lossless n-way split (fixes the reference's len%5 row loss).
    "ref_u5_ntile_split" -> { (s, dir) =>
      RefOps.splitEven(5, Seq(col("c_custkey")))(Tables.customer(s, dir))
        .groupBy(col("part_id"))
        .agg(count(lit(1)).as("n"),
          min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"))
        .orderBy(col("part_id"))
    },

    // S2: JSON path extraction (content["data"] navigation, etl.py:31,57).
    "ref_s2_json_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        // JSON-path extraction above the sort (the sampling pass would
        // otherwise parse every props payload twice).
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // S3: nested-array flatten — group values to a sorted list, then
    // explode back (the sitemap child-array reshape, etl.py:32-39).
    "ref_s3_explode_flatten" -> { (s, dir) =>
      Tables.nation(s, dir)
        .groupBy(col("n_regionkey"))
        .agg(sort_array(collect_list(col("n_name"))).as("names"))
        .select(col("n_regionkey"), explode(col("names")).as("n_name"))
        .orderBy(col("n_regionkey"), col("n_name"))
    },

    // L2/L5/L8: MERGE upsert — target rows not in source survive, source
    // rows insert-or-overwrite (ON DUPLICATE KEY UPDATE semantics).
    "ref_l2_upsert" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val source = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      Upsert.upsert(target, source, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },
  )

  val oracles: Map[String, String] = Map(
    "ref_p1_projection" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey",

    "ref_p4_tag_literal" ->
      "SELECT r_regionkey, r_name, 'thoi-trang-nu' AS category FROM region ORDER BY r_regionkey",

    "ref_p7_strip_suffix" ->
      """SELECT p_partkey, regexp_replace(p_name || '.html', '\.html$', '') AS url_key
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ref_p8_date_parse" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(strptime(strftime(l_shipdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS ship_day
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "ref_p9_ri_semijoin" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "ref_u1_union_pages" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 1
        |UNION ALL SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 2
        |ORDER BY o_orderkey""".stripMargin,

    "ref_u3_dedup_first" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
        |ORDER BY o_custkey""".stripMargin,

    "ref_u4_distinct_union" ->
      """SELECT DISTINCT c_custkey FROM
        |  (SELECT c_custkey FROM customer UNION ALL SELECT o_custkey AS c_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "ref_u5_ntile_split" ->
      """SELECT part_id, COUNT(*) AS n, MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        |FROM (SELECT c_custkey, ntile(5) OVER (ORDER BY c_custkey) AS part_id FROM customer)
        |GROUP BY part_id ORDER BY part_id""".stripMargin,

    "ref_s2_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "ref_s3_explode_flatten" ->
      "SELECT n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name",

    "ref_l2_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
        |source AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT * FROM (
        |  SELECT t.* FROM target t WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM source)
        |  UNION ALL SELECT * FROM source)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
