package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the engine's data model (SURVEY.md §1).
  *
  * The warehouse schemas mirror the reference DDL
  * (reference sql/dwh.sql:1-45): one dimension (`shop_info`) and two child
  * tables (`product_detail`, `rating`) keyed to it. The reference infers
  * types in flight (pandas) and coerces at load; we instead validate at the
  * pipeline boundary with these StructTypes — fail fast, same contract.
  *
  * VARCHAR(n) lengths in the DDL are constraints, not types; Spark has no
  * bounded string type, so they map to StringType (SURVEY §1.3).
  */
object Schemas {

  /** reference sql/dwh.sql:1-15 — PK shop_id. */
  val shopInfo: StructType = StructType(Seq(
    StructField("shop_id", StringType, nullable = false),
    StructField("shop_name", StringType),
    StructField("good_review_percent", DecimalType(10, 2)),
    StructField("score", DecimalType(10, 2)),
    StructField("customer_id", StringType),
    StructField("phone_number", StringType),
    StructField("rating_avg", DecimalType(10, 2)),
    StructField("rating_count", IntegerType),
    StructField("response_time", StringType),
    StructField("product_total", IntegerType),
    StructField("sale_on_sendo", StringType),
    StructField("time_prepare_product", StringType),
    // "warehourse" misspelling is load-bearing: it is the API field name,
    // the projection name, and the DDL column (reference sql/dwh.sql:14).
    StructField("warehourse_region_name", StringType),
  ))

  /** reference sql/dwh.sql:17-29 — PK product_id, FK shop_id → shop_info. */
  val productDetail: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("category_path", StringType),
    StructField("price", DecimalType(15, 2)),
    StructField("price_max", DecimalType(15, 2)),
    StructField("final_price", DecimalType(15, 2)),
    StructField("final_price_max", DecimalType(15, 2)),
    StructField("shop_id", StringType),
    StructField("category", StringType),
    StructField("sub_category", StringType),
  ))

  /** reference sql/dwh.sql:31-45 — PK rating_id, FK shop_id → shop_info. */
  val rating: StructType = StructType(Seq(
    StructField("rating_id", StringType, nullable = false),
    StructField("shop_id", StringType),
    StructField("address", StringType),
    StructField("star", IntegerType),
    StructField("comment", StringType),
    StructField("status", StringType),
    StructField("update_time", DateType),
    StructField("customer_id", StringType),
    StructField("user_name", StringType),
    StructField("product_name", StringType),
    StructField("product_path", StringType),
    StructField("price", DecimalType(15, 2)),
  ))

  /** Projection contract of the product extract (reference dags/etl.py:67-80):
    * these named columns must exist after the product scan. */
  val productColumns: Seq[String] = Seq(
    "product_id", "name", "category_path", "price", "price_max",
    "final_price", "final_price_max", "shop_id", "category", "sub_category")

  /** reference dags/etl.py:98-114. */
  val shopInfoColumns: Seq[String] = Seq(
    "shop_id", "shop_name", "good_review_percent", "score", "customer_id",
    "phone_number", "rating_avg", "rating_count", "response_time",
    "product_total", "sale_on_sendo", "time_prepare_product",
    "warehourse_region_name")

  /** reference dags/etl.py:148-163. */
  val ratingColumns: Seq[String] = Seq(
    "rating_id", "shop_id", "address", "star", "comment", "status",
    "update_time", "customer_id", "user_name", "product_name",
    "product_path", "price")

  /** Primary keys of the three warehouse tables (dwh.sql:2,18,32) — the
    * upsert merge keys (reference dags/etl.py:181-199, 218-241, 260-276). */
  val primaryKeys: Map[String, String] = Map(
    "shop_info" -> "shop_id",
    "product_detail" -> "product_id",
    "rating" -> "rating_id",
  )
}
