package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's Redshift analytical query layer
  * (`etl_notebooks/redshift-etl-notebook.ipynb` cells 35, 41, 43, 45, 47,
  * 49, 51), served in-engine as Spark SQL over the published model tables
  * — the warehouse (S9/S10) collapses into temp views over the
  * [[graft.sources.StateStore]] parquet state.
  *
  * SQL is kept verbatim-shaped (same joins/windows/aggregations); only the
  * Redshift-isms are translated (`::decimal` -> CAST, `ROWS 7 PRECEDING`
  * frames are identical in Spark SQL).
  */
object ModelQueries {

  /** Register the five model tables from a state root. */
  def registerModel(spark: SparkSession, store: graft.sources.StateStore): Unit =
    Seq("listings", "hosts", "reviewers", "reviews", "weather")
      .foreach(n => store.read(n).createOrReplaceTempView(n))

  /** Cell 35: per-city average weather. */
  def avgWeatherByCity(spark: SparkSession): DataFrame = spark.sql(
    """SELECT city, avg(temperature) AS avg_temperature, avg(rain) AS avg_rain
      |FROM weather GROUP BY city ORDER BY city""".stripMargin)

  /** Cell 41: sentiment share of classified (pos/neg) reviews. */
  def sentimentShare(spark: SparkSession): DataFrame = spark.sql(
    """SELECT sentiment,
      |  CAST(count(*) AS DECIMAL(20,6)) /
      |    (SELECT count(*) FROM reviews WHERE sentiment IN ('pos','neg')) AS share
      |FROM reviews WHERE sentiment IN ('pos','neg')
      |GROUP BY sentiment ORDER BY sentiment""".stripMargin)

  /** Cell 43: sentiment vs 8-day trailing mean temperature at review time. */
  def sentimentVsMovingTemp(spark: SparkSession): DataFrame = spark.sql(
    """SELECT sentiment, avg(moving_avg_temperature) AS avg_moving_temp
      |FROM reviews
      |JOIN (SELECT weather_id,
      |        avg(temperature) OVER (PARTITION BY city ORDER BY date
      |          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS moving_avg_temperature
      |      FROM weather) USING (weather_id)
      |WHERE sentiment IN ('pos','neg')
      |GROUP BY sentiment ORDER BY sentiment""".stripMargin)

  /** Cell 45: sentiment vs 4-day trailing rain sum. */
  def sentimentVsMovingRain(spark: SparkSession): DataFrame = spark.sql(
    """SELECT sentiment, avg(moving_sum_rain) AS avg_moving_rain
      |FROM reviews
      |JOIN (SELECT weather_id,
      |        sum(rain) OVER (PARTITION BY city ORDER BY date
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_sum_rain
      |      FROM weather) USING (weather_id)
      |WHERE sentiment IN ('pos','neg')
      |GROUP BY sentiment ORDER BY sentiment""".stripMargin)

  /** Cell 47: top review languages by share. */
  def topLanguages(spark: SparkSession, k: Int = 5): DataFrame = spark.sql(
    s"""SELECT comment_language,
       |  CAST(count(*) AS DECIMAL(20,6)) * 100 / (SELECT count(*) FROM reviews)
       |    AS share_perc
       |FROM reviews WHERE comment_language IS NOT NULL
       |GROUP BY comment_language ORDER BY share_perc DESC, comment_language
       |LIMIT $k""".stripMargin)

  /** Cell 49: hosts listing in the most cities. */
  def multiCityHosts(spark: SparkSession, k: Int = 5): DataFrame = spark.sql(
    s"""SELECT host_id, count(*) AS cities FROM (
       |  SELECT DISTINCT host_id, city FROM hosts JOIN listings USING (host_id))
       |GROUP BY host_id ORDER BY cities DESC, host_id LIMIT $k""".stripMargin)

  /** Cell 51: histogram of cities visited per reviewer. */
  def citiesVisitedHistogram(spark: SparkSession): DataFrame = spark.sql(
    """SELECT cities_visited, count(*) AS reviewers FROM (
      |  SELECT reviewer_id, count(*) AS cities_visited FROM (
      |    SELECT DISTINCT reviewer_id, listings.city
      |    FROM reviews JOIN listings ON reviews.listing_id = listings.listing_id)
      |  GROUP BY reviewer_id)
      |GROUP BY cities_visited ORDER BY cities_visited""".stripMargin)
}
