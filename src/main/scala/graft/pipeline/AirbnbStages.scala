package graft.pipeline

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference pipeline's five stages (SURVEY.md §3.1), re-expressed as
  * pure DataFrame -> DataFrame functions. Orchestration (Airflow DAG,
  * EMR steps) collapses into [[PipelineRunner]]; these functions carry the
  * operator semantics.
  *
  * Deliberate divergences from the reference, documented per SURVEY §7:
  *  - `unionByName(allowMissingColumns)` instead of sort-columns +
  *    positional union (`apps/process_listings_hosts.py:97,111`);
  *  - deterministic `row_number` latest-per-key instead of `last` over an
  *    unbounded window + `dropDuplicates` (`:121-125`), which keeps an
  *    arbitrary row among timestamp ties;
  *  - language/sentiment as `when/otherwise` over native expressions
  *    instead of the split -> NLP -> 3-way union (`apps/process_reviews
  *    .py:125-140`) — same output domain, no union shuffle.
  */
object AirbnbStages {

  /** Part I header normalization: `column.replace(" ","_").lower()`
    * (`apps/preprocess_data.py:85`).
    */
  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.replace(" ", "_").toLowerCase(java.util.Locale.ROOT)): _*)

  /** Part I listings preprocess (`apps/preprocess_data.py:83-117`): drop
    * junk columns, stamp partition keys from the scrape date.
    */
  def preprocessListings(raw: DataFrame, dropCols: Seq[String],
                         scrapeDateCol: String = "last_scraped"): DataFrame =
    normalizeHeaders(raw)
      .drop(dropCols: _*)
      .withColumn("scrape_year", year(col(scrapeDateCol)))
      .withColumn("scrape_month", month(col(scrapeDateCol)))

  /** Listings/hosts incremental merge (`apps/process_listings_hosts.py:
    * 120-127`): state ∪ monthly, keep the latest record per key; monthly
    * wins deterministically on a same-timestamp re-scrape.
    */
  def mergeLatest(state: Option[DataFrame], monthly: DataFrame,
                  key: String, tsCol: String): DataFrame =
    state match {
      case None => Dedup.latestPerKey(monthly, Seq(key), Seq(col(tsCol).desc, col(key)))
      case Some(st) =>
        Dedup.mergeIncremental(st, monthly, Seq(key), Seq(col(tsCol).desc, col(key)))
    }

  /** Host-dimension extraction from listings (`apps/process_listings_hosts
    * .py:131-145`): project host columns, latest record per host.
    */
  def extractHosts(listings: DataFrame, hostCols: Seq[String],
                   tsCol: String): DataFrame =
    Dedup.latestPerKey(
      listings.select((hostCols :+ tsCol).map(col): _*),
      Seq(hostCols.head),
      // a host's listings share one last_scraped per month, so tie-break
      // on the attribute values themselves for a deterministic winner
      col(tsCol).desc +: hostCols.tail.map(c => col(c).asc))

  /** Weather build (`apps/process_weather.py:86-104`): temp ⋈ rain on
    * (date, staid), ⋈ broadcast stations, tenths -> units, range filter,
    * surrogate `weather_id = city_date`. Column casing follows the
    * normalized (lowercase) convention.
    */
  def buildWeather(temp: DataFrame, rain: DataFrame,
                   stations: DataFrame): DataFrame =
    temp.select(col("staid"), col("date"),
        (col("tg").cast("double") / 10).as("temperature"))
      .join(rain.select(col("staid"), col("date"),
        (col("rr").cast("double") / 10).as("rain")), Seq("date", "staid"))
      .join(broadcast(stations), Seq("staid"))
      .withColumn("date", to_date(col("date"), "yyyyMMdd"))
      .filter(col("date") > to_date(lit("20090101"), "yyyyMMdd"))
      .withColumn("weather_id", concat_ws("_", col("city"), col("date")))
      .select("weather_id", "city", "date", "temperature", "rain")

  /** Reviews high-watermark delta (`apps/process_reviews.py:98-105`): keep
    * monthly rows at/after the state's max date. Re-ingesting the boundary
    * date is intentional — duplicates are removed by the pk dedup in
    * [[mergeReviews]] (reference rationale `README.md:202-214`). The
    * rejected NOT-IN anti-join alternative (>2 h on EMR, `README.md:
    * 193-200`) is available as `Dedup`-free `left_anti` for small states.
    */
  def reviewsDelta(state: Option[DataFrame], monthly: DataFrame,
                   dateCol: String = "date"): DataFrame =
    state match {
      case None => monthly
      case Some(st) =>
        val wm = st.agg(max(col(dateCol)).as("wm"))
        monthly.crossJoin(broadcast(wm)).filter(col(dateCol) >= col("wm")).drop("wm")
    }

  /** FK enrichment (`apps/process_reviews.py:110-116`): left join listings
    * to attach host_id; mint `weather_id = city_date` for the weather dim.
    */
  def enrichReviews(delta: DataFrame, listings: DataFrame): DataFrame =
    delta.join(listings.select(col("listing_id"), col("host_id"), col("city")),
        Seq("listing_id"), "left")
      // day precision, matching buildWeather's DateType key — a raw
      // timestamp would render "yyyy-MM-dd HH:mm:ss" and never join
      .withColumn("weather_id", concat_ws("_", col("city"), to_date(col("date"))))

  /** Language + sentiment scoring (`apps/process_reviews.py:125-140`).
    * The reference splits into non-English / English-scored / null-comment
    * frames and 3-way unions them back; `when/otherwise` over the native
    * expressions produces the same {pos, neg, n/a} domain in one pass.
    */
  def scoreReviews(reviews: DataFrame, textCol: String = "comments"): DataFrame =
    reviews
      .withColumn("comment_language",
        when(col(textCol).isNull || length(trim(col(textCol))) === 0, lit(null))
          .otherwise(TextFunctions.langId(col(textCol))))
      .withColumn("sentiment",
        when(col("comment_language") === "en", TextFunctions.sentiment(col(textCol)))
          .otherwise(lit("n/a")))

  /** Reviews incremental merge + pk dedup (`apps/process_reviews.py:
    * 146-148`) — newest date wins per review_id; full ties resolve
    * delta-first, then by row-hash (see Dedup.mergeIncremental).
    */
  def mergeReviews(state: Option[DataFrame], delta: DataFrame): DataFrame =
    Dedup.mergeIncremental(
      state.getOrElse(delta.limit(0)), delta,
      Seq("review_id"), Seq(col("date").desc, col("review_id")))

  /** Reviewers dimension (`apps/process_reviewers.py:83-95`): one row per
    * reviewer with the latest name and the set of languages they reviewed
    * in. The reference's full-frame window + collect_set + dropDuplicates
    * is one groupBy here: `max_by` for latest, `collect_set` for the set.
    */
  def buildReviewers(reviews: DataFrame): DataFrame =
    reviews.groupBy(col("reviewer_id"))
      .agg(
        max_by(col("reviewer_name"), struct(col("date"), col("review_id"))).as("reviewer_name"),
        max(col("date")).as("last_updated"),
        array_join(array_sort(collect_set(col("comment_language"))), ",").as("languages"))
}
