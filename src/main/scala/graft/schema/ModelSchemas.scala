package graft.schema

import org.apache.spark.sql.types._

/** Authoritative schemas for the published model tables (SURVEY §2.1 S10).
  *
  * The reference declares these once as warehouse DDL
  * (`airflow/.../airbnb-etl-airflow.py:365-482`: CREATE TABLE listings /
  * weather / reviews / hosts / reviewers) and its README records the cost
  * of NOT enforcing them upstream: a varchar-vs-integer drift between the
  * notebook DDL and the DAG DDL (`airbnb-etl-airflow.py:390`,
  * `README.md:216-217`) surfaced only at COPY time. Here the schema is a
  * publish-time gate instead: [[graft.sources.StateStore.publish]] runs a
  * validator against the written parquet before the atomic swap, so a
  * drifted column aborts the publish and keeps the previous model.
  *
  * Two strictness levels, matching how each table's columns originate:
  *  - tables whose every column the ENGINE mints (weather, reviewers) get
  *    an exact ordered schema;
  *  - tables that pass deployment-specific source columns through
  *    (listings, hosts, reviews) get a required-field contract: the
  *    columns the pipeline stages promise, with exact types.
  *
  * Key convention: 64-bit ids (the reference's `integer` ids overflowed
  * 32 bits on real scrape ids for other cities; LongType is the safe
  * superset). Timestamps stay TimestampType through the model; the
  * reference narrows to `date` only at the warehouse boundary.
  */
object ModelSchemas {

  /** `weather` — engine-built end to end (`buildWeather`), exact order.
    * Reference DDL `airbnb-etl-airflow.py:433-439`. */
  val weather: StructType = StructType(Seq(
    StructField("weather_id", StringType),
    StructField("city", StringType),
    StructField("date", DateType),
    StructField("temperature", DoubleType),
    StructField("rain", DoubleType)))

  /** `reviewers` — engine-built end to end (`buildReviewers`), exact order.
    * Reference DDL `airbnb-etl-airflow.py:474-479` (`languages_spoken
    * varchar` is `languages` here; `last_updated` keeps event precision). */
  val reviewers: StructType = StructType(Seq(
    StructField("reviewer_id", LongType),
    StructField("reviewer_name", StringType),
    StructField("last_updated", TimestampType),
    StructField("languages", StringType)))

  /** `reviews` — stage-contract columns (`enrichReviews` + `scoreReviews`
    * mint host_id/weather_id/comment_language/sentiment; the rest passes
    * through from the source). Reference DDL `airbnb-etl-airflow.py:441-452`. */
  val reviewsContract: StructType = StructType(Seq(
    StructField("review_id", LongType),
    StructField("listing_id", LongType),
    StructField("reviewer_id", LongType),
    StructField("host_id", LongType),
    StructField("weather_id", StringType),
    StructField("date", TimestampType),
    StructField("comment_language", StringType),
    StructField("sentiment", StringType)))

  /** `listings` — contract columns only: the merge key and its ordering
    * timestamp. The timestamp column NAME follows the runner's `tsCol`
    * parameter (default `last_scraped`) — a fixed name here would silently
    * forbid every non-default `tsCol`. Reference DDL
    * `airbnb-etl-airflow.py:368-430`. */
  def listingsContract(tsCol: String = "last_scraped"): StructType = StructType(Seq(
    StructField("listing_id", LongType),
    StructField("host_id", LongType),
    StructField(tsCol, TimestampType)))

  /** `hosts` — contract columns only; timestamp name follows `tsCol`.
    * Reference DDL `airbnb-etl-airflow.py:455-473`. */
  def hostsContract(tsCol: String = "last_scraped"): StructType = StructType(Seq(
    StructField("host_id", LongType),
    StructField(tsCol, TimestampType)))
}
