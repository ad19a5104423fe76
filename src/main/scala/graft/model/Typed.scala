package graft.model

import java.math.{BigDecimal => JBigDecimal}
import java.sql.Date

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/** Typed `Dataset[T]` surface for the three warehouse tables (the
  * optional type-safe API promised in SURVEY §1.4). Case-class fields
  * mirror [[Schemas]] one-to-one — names, order, and types (DECIMAL →
  * java BigDecimal, DATE → java.sql.Date), including the load-bearing
  * `warehourse` misspelling (reference sql/dwh.sql:14).
  *
  * `DataFrame` stays the engine-internal abstraction (SURVEY §1.4);
  * these encoders give library users compile-time field checking at the
  * API boundary with zero runtime cost beyond the `as[T]` analysis
  * (the Catalyst plan is identical — no extra serialization until a
  * typed lambda is actually used).
  */
object Typed {

  /** reference sql/dwh.sql:1-15. */
  final case class ShopInfo(
      shop_id: String,
      shop_name: String,
      good_review_percent: JBigDecimal,
      score: JBigDecimal,
      customer_id: String,
      phone_number: String,
      rating_avg: JBigDecimal,
      rating_count: Option[Int],
      response_time: String,
      product_total: Option[Int],
      sale_on_sendo: String,
      time_prepare_product: String,
      warehourse_region_name: String)

  /** reference sql/dwh.sql:17-29. */
  final case class ProductDetail(
      product_id: String,
      name: String,
      category_path: String,
      price: JBigDecimal,
      price_max: JBigDecimal,
      final_price: JBigDecimal,
      final_price_max: JBigDecimal,
      shop_id: String,
      category: String,
      sub_category: String)

  /** reference sql/dwh.sql:31-45. */
  final case class Rating(
      rating_id: String,
      shop_id: String,
      address: String,
      star: Option[Int],
      comment: String,
      status: String,
      update_time: Date,
      customer_id: String,
      user_name: String,
      product_name: String,
      product_path: String,
      price: JBigDecimal)

  implicit val shopInfoEncoder: Encoder[ShopInfo] = Encoders.product[ShopInfo]
  implicit val productDetailEncoder: Encoder[ProductDetail] =
    Encoders.product[ProductDetail]
  implicit val ratingEncoder: Encoder[Rating] = Encoders.product[Rating]

  /** `as[T]` with the column types pinned to the DDL's — in particular
    * DECIMAL precision, not the encoder's default (38,18): a plain
    * `.as[ShopInfo]` would silently up-cast DECIMAL(10,2) columns and
    * change arithmetic scale downstream. The explicit cast makes the
    * warehouse types authoritative even when the input frame drifted
    * (e.g. arithmetic widened a decimal); a bare select would only
    * reorder columns and inherit whatever type the input carries.
    * Missing columns still fail fast at analysis. */
  private def as[T](df: DataFrame, schema: org.apache.spark.sql.types.StructType)(
      implicit e: Encoder[T]): Dataset[T] =
    df.select(schema.fields
      .map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*).as[T]

  def shopInfo(df: DataFrame): Dataset[ShopInfo] =
    as[ShopInfo](df, Schemas.shopInfo)

  def productDetail(df: DataFrame): Dataset[ProductDetail] =
    as[ProductDetail](df, Schemas.productDetail)

  def rating(df: DataFrame): Dataset[Rating] =
    as[Rating](df, Schemas.rating)
}
