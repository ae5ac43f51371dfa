package graft

import graft.operators.{Aggregates, Dedup, Windows}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2) exercised on the
  * TPC-H-ish fixtures, each with a DuckDB oracle.
  *
  * Determinism conventions (hash-compare safe):
  *  - money/quantity sums go through `decimal(18,2|4)` per-value casts so
  *    the sum is exact and order-independent, then back to double;
  *  - double averages are rounded to 4 decimals;
  *  - every query ends in a total-order ORDER BY;
  *  - computed integers are cast to long (DuckDB returns BIGINT).
  */
object RelationalQueries {

  private def decSum2(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")
  private def decSum4(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  val all: Seq[QDef] = Seq(

    // ---- A1-A3: grouped aggregation (TPC-H Q1 shape; SURVEY §2.4) ----
    QDef("q01_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(decSum2(col("l_quantity")), 2).as("sum_qty"),
          round(decSum2(col("l_extendedprice")), 2).as("sum_base_price"),
          round(decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
             |round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
             |round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
             |round(avg(l_quantity), 4) AS avg_qty,
             |round(avg(l_discount), 4) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- O3 top-k + join + agg (SURVEY §2.6) ----
    QDef("q02_top_customers",
      (s, dir) => Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(round(decSum2(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(5),
      Some("""SELECT c_custkey, c_name,
             |round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
             |count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey LIMIT 5""".stripMargin)),

    // ---- J2/J3/J4: multi-way star join, small dims broadcast (SURVEY §2.3) ----
    QDef("q03_star_revenue",
      // rescue-spread the single-row-group fact scan (r15): this query
      // stacks THREE join probes + a two-key aggregation on the scan
      // stage, which otherwise runs serial on the one-split fixture
      // (measured 2.14 -> 1.80 s; the loader-level spread was a net loss
      // for the cheap one-pass lineitem consumers, so the spread lives
      // with the one consumer whose probe compute pays for the shuffle)
      (s, dir) => graft.operators.Spread.forCompute(Tables.lineitem(s, dir))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        // customer scales with SF — no forced broadcast; AQE/stats decide.
        // nation/region stay hinted: bounded cardinality (25 / 5 rows) at any SF.
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(decSum4(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count_distinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name,
             |round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
             |count(DISTINCT o_orderkey) AS n_orders
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // ---- J1: left outer FK enrichment (reference apps/process_reviews.py:110-116) ----
    QDef("q04_left_enrich",
      (s, dir) => Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          col("o_totalprice"),
          coalesce(col("c_name"), lit("unknown")).as("customer_name"),
          coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, year(o_orderdate) AS order_year, o_totalprice,
             |coalesce(c_name, 'unknown') AS customer_name,
             |coalesce(c_mktsegment, 'unknown') AS segment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- J5: anti join (the reference's rejected NOT-IN plan, README.md:193-199).
    //      Restricted to recent orders so the result is non-vacuous:
    //      "customers with no order since mid-1998". ----
    QDef("q05_anti_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '1998-06-01')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- semi join (EXISTS) ----
    QDef("q06_semi_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- J6/A1: high-watermark delta via scalar subquery
    //      (reference apps/process_reviews.py:98-105) ----
    QDef("q07_watermark_delta",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
                |WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 90 DAY
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
             |WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 90 DAY
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- W1/A6: deterministic latest-record-per-key
    //      (reference apps/process_listings_hosts.py:121-125, made deterministic) ----
    QDef("q08_latest_per_key",
      (s, dir) => Dedup.latestPerKey(Tables.events(s, dir), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_id, event_type, value FROM (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- W3/W4: bounded moving aggregates
    //      (reference redshift-etl-notebook cells 43/45) ----
    QDef("q10_moving_agg",
      (s, dir) => {
        // decimal window sums: exact, order-independent — double window
        // aggregation disagrees with the oracle's segment-tree summation
        // in the last ulp, which flips round() at boundaries
        val base = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val w7 = base.rowsBetween(-7, 0)
        val w3 = base.rowsBetween(-3, 0)
        val dec = col("value").cast("decimal(18,2)")
        // moving avg in exact integer arithmetic (cents), HALF_UP to 1e-4:
        // engines' round(double) semantics differ exactly at .xxxx5
        val cents7 = (sum(dec).over(w7) * 100).cast("long")
        val cnt7 = count(lit(1)).over(w7)
        // a/b with b <= 16 can't round across an integer, so floor is exact
        val avgE4 = floor((cents7 * 200 + cnt7) / (cnt7 * 2))
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          (avgE4 / lit(10000.0)).as("mavg7"),
          sum(dec).over(w3).cast("double").as("msum3"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |((CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w7 * 100 AS BIGINT) * 200 + count(*) OVER w7)
             |  // (count(*) OVER w7 * 2)) / 10000.0 AS mavg7,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w3 AS DOUBLE) AS msum3
             |FROM events
             |WINDOW w7 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
             |       w3 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- A7/W2/F10: set-collect + array_join
    //      (reference apps/process_reviewers.py:85-93) ----
    QDef("q11_collect_set",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
             |count(*) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- A4: share-of-total (reference redshift-etl-notebook cells 41/47) ----
    QDef("q12_share_of_total",
      (s, dir) => Aggregates.shareOfTotal(Tables.events(s, dir), Seq("event_type"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS cnt,
             |round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM events), 6) AS share
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- A5: multi-level aggregation (reference cells 49/51) ----
    QDef("q13_distinct_histogram",
      (s, dir) => Aggregates.distinctCountHistogram(Tables.events(s, dir),
          "user_id", "event_type")
        .orderBy(col("n_distinct")),
      Some("""SELECT n_distinct, count(*) AS n_keys FROM (
             |  SELECT user_id, count(DISTINCT event_type) AS n_distinct
             |  FROM events GROUP BY user_id)
             |GROUP BY n_distinct ORDER BY n_distinct""".stripMargin)),

    // ---- U1/A6: incremental snapshot merge with overlapping delta
    //      (reference apps/process_reviews.py:146-148) ----
    QDef("q14_incremental_merge",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val state = orders.filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        val delta = orders.filter(col("o_orderdate") >= lit("1998-07-01").cast("timestamp"))
        Dedup.mergeIncremental(state, delta, Seq("o_orderkey"),
            Seq(col("o_orderdate").desc, col("o_orderkey")))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT DISTINCT o_orderkey, o_orderdate, o_totalprice FROM (
             |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
             |  UNION ALL
             |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01')
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- ranking window functions (idiomatic W1 replacements) ----
    QDef("q15_rank_top3",
      (s, dir) => {
        val w = Window.partitionBy(col("n_name"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("prev_bal", lag(col("c_acctbal"), 1).over(w))
          .filter(col("rnk") <= 3)
          .select(col("n_name"), col("rnk"), col("c_custkey"), col("c_name"),
            col("c_acctbal"), col("prev_bal"))
          .orderBy(col("n_name"), col("rnk"))
      },
      Some("""SELECT n_name, rnk, c_custkey, c_name, c_acctbal, prev_bal FROM (
             |  SELECT n_name, c_custkey, c_name, c_acctbal,
             |    rank() OVER w AS rnk, lag(c_acctbal) OVER w AS prev_bal
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey))
             |WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin)),

    // ---- F1-F13: scalar function sampler (SURVEY §2.8) ----
    QDef("q16_scalar_funcs",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month"),
          concat_ws("_", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          element_at(split(col("o_orderpriority"), "-"), 1).as("prio_num"),
          upper(substring(col("o_orderpriority"), 3, 3)).as("prio_sub"),
          length(col("o_orderpriority")).cast("long").as("prio_len"),
          when(col("o_totalprice") > 200000, "big").otherwise("small").as("size_class"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, year(o_orderdate) AS order_year,
             |month(o_orderdate) AS order_month,
             |concat_ws('_', o_orderstatus, o_orderpriority) AS status_prio,
             |string_split(o_orderpriority, '-')[1] AS prio_num,
             |upper(substring(o_orderpriority, 3, 3)) AS prio_sub,
             |length(o_orderpriority) AS prio_len,
             |CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class,
             |CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- rollup (grouping sets; beyond reference scope) ----
    QDef("q17_rollup",
      (s, dir) => Tables.orders(s, dir)
        .withColumn("order_year", year(col("o_orderdate")).cast("long"))
        .rollup(col("order_year"), col("o_orderstatus"))
        .agg(round(decSum2(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("order_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
      Some("""SELECT year(o_orderdate) AS order_year, o_orderstatus,
             |round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
             |count(*) AS n
             |FROM orders GROUP BY ROLLUP(order_year, o_orderstatus)
             |ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)),

    // ---- cube (full grouping-sets lattice; complements q17 rollup) ----
    QDef("q39_cube",
      (s, dir) => Tables.events(s, dir)
        .withColumn("segment", pmod(col("user_id"), lit(4)))
        .cube(col("event_type"), col("segment"))
        .agg(count(lit(1)).as("n"), round(decSum2(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("segment").asc_nulls_first),
      Some("""SELECT event_type, user_id % 4 AS segment, count(*) AS n,
             |round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
             |FROM events GROUP BY CUBE(event_type, segment)
             |ORDER BY event_type ASC NULLS FIRST, segment ASC NULLS FIRST""".stripMargin)),

    // ---- S3-analog + regex: text-line parsing of the props field ----
    QDef("q18_string_parse",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k_val"),
          upper(col("event_type")).as("type_upper"),
          length(col("props")).cast("long").as("props_len"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_val,
             |upper(event_type) AS type_upper,
             |length(props) AS props_len
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- exact percentiles / distribution stats ----
    QDef("q19_percentiles",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(min(col("value")), 4).as("vmin"),
          round(max(col("value")), 4).as("vmax"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |round(quantile_cont(value, 0.5), 4) AS p50,
             |round(quantile_cont(value, 0.9), 4) AS p90,
             |round(min(value), 4) AS vmin, round(max(value), 4) AS vmax,
             |count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- gap-based sessionization (streaming-shaped, batch form) ----
    QDef("q29_sessionize",
      (s, dir) => Windows.sessionize(Tables.events(s, dir), "user_id", "ts", 1800.0)
        .select(col("user_id"), col("event_id"), col("session_seq").cast("long").as("session_seq"))
        .orderBy(col("user_id"), col("event_id")),
      Some("""SELECT user_id, event_id,
             |CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
             |  OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             |FROM (SELECT user_id, event_id, epoch_us(ts) AS us,
             |        lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
             |      FROM events)
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- event-time tumbling-window aggregation ----
    QDef("q30_hourly_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(decSum2(col("value")), 2).as("sum_value"))
        .orderBy(col("hour_start"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type,
             |count(*) AS n,
             |round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
             |FROM events GROUP BY date_trunc('hour', ts), event_type
             |ORDER BY hour_start, event_type""".stripMargin)),

    // ---- pivot (conditional aggregation) ----
    QDef("q31_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        types.foldLeft(p)((d, t) => d.withColumn(t, coalesce(col(t), lit(0L))))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |count(*) FILTER (event_type = 'click') AS click,
             |count(*) FILTER (event_type = 'error') AS error,
             |count(*) FILTER (event_type = 'purchase') AS purchase,
             |count(*) FILTER (event_type = 'signup') AS signup,
             |count(*) FILTER (event_type = 'view') AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- U2: split -> transform -> 3-way union recombination
    //      (reference apps/process_reviews.py:137-140) ----
    QDef("q32_union_recombine",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .withColumn("label", lit("revenue"))
        val errors = ev.filter(col("event_type") === "error")
          .withColumn("label", lit("problem"))
        val rest = ev.filter(!col("event_type").isin("purchase", "error"))
          .withColumn("label", lit("other"))
        purchases.unionByName(errors).unionByName(rest)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), round(decSum2(col("value")), 2).as("sum_value"))
          .orderBy(col("label"))
      },
      Some("""SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
             |            WHEN event_type = 'error' THEN 'problem'
             |            ELSE 'other' END AS label,
             |count(*) AS n,
             |round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY label""".stripMargin)),

    // ---- backward as-of join (attribution: each purchase gets the latest
    //      prior view of the same user). One shuffle on the key — no
    //      range-expanded join; see TemporalJoins.asofBackward. The oracle
    //      replays the union + running last_value(IGNORE NULLS) with the
    //      identical (ts, side, tie) ordering at microsecond precision. ----
    QDef("q41_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"), col("ts"))
        graft.operators.TemporalJoins.asofBackward(
            purchases, views, Seq("user_id"), "ts", "ts",
            payloadCols = Seq("event_id"), tieCol = "event_id")
          .select(col("user_id"), col("event_id"),
            col("asof.event_id").as("view_event_id"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, epoch_us(ts) AS us, 0 AS side, event_id AS tie,
             |         event_id AS v_eid, NULL::BIGINT AS event_id
             |  FROM events WHERE event_type = 'view'
             |  UNION ALL
             |  SELECT user_id, epoch_us(ts), 1, NULL, NULL, event_id
             |  FROM events WHERE event_type = 'purchase'),
             |w AS (
             |  SELECT user_id, event_id, side,
             |    last_value(v_eid IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY us, side, tie
             |      ROWS UNBOUNDED PRECEDING) AS view_event_id
             |  FROM u)
             |SELECT user_id, event_id, view_event_id FROM w WHERE side = 1
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- bounded-interval range join (context window: events of the same
    //      user within the 24 h before each error). Bin-bucketed on
    //      (key, day bin) — bounded 2x fan-out, not a key-partition cross
    //      product; see TemporalJoins.rangeJoin. Oracle compares at
    //      microsecond precision (epoch_us) on both engines. ----
    QDef("q42_range_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
        val all = ev.select(col("user_id"), col("event_id").as("src_id"), col("ts").as("src_ts"))
        graft.operators.TemporalJoins.rangeJoin(
            errors, all, Seq("user_id"), "err_ts", "src_ts",
            lowerSec = -86400L, upperSec = 0L)
          .groupBy(col("user_id"), col("err_id"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy(col("user_id"), col("err_id"))
      },
      Some("""SELECT e.user_id, e.event_id AS err_id, count(*) AS n_events
             |FROM events e JOIN events x ON e.user_id = x.user_id
             |  AND epoch_us(x.ts) BETWEEN epoch_us(e.ts) - 86400000000 AND epoch_us(e.ts)
             |WHERE e.event_type = 'error'
             |GROUP BY e.user_id, e.event_id
             |ORDER BY e.user_id, err_id""".stripMargin)),

    // ---- skew-salted equi-join (Skew.saltedJoin): the explicit hot-key
    //      rewrite for when AQE's runtime skew splitting can't apply —
    //      the left side's key is split across saltFactor sub-keys and the
    //      dimension is replicated to match, so one hot key spreads over
    //      saltFactor tasks instead of one straggler. The rewrite must be
    //      RESULT-INVISIBLE, which is exactly what the oracle checks: the
    //      salted plan vs the plain SQL join. ----
    QDef("q63_salted_join",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey").as("o_custkey"), col("c_name"),
            col("c_mktsegment"))
        graft.operators.Skew.saltedJoin(orders, cust, "o_custkey",
            saltFactor = 8)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, c_name, c_mktsegment
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- first-completion event funnel (signup -> view -> purchase):
    //      per user, earliest step-i event at or after step i-1, plus the
    //      completed-prefix count. One shuffle, k window passes over the
    //      same exchange (Funnel.firstCompletion). Timestamps compared at
    //      epoch micros for cross-engine parity (q41/q42 pattern). ----
    QDef("q68_funnel",
      (s, dir) => graft.operators.Funnel.firstCompletion(
          Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("signup", "view", "purchase"))
        .select(col("user_id"),
          unix_micros(col("t_signup")).as("t_signup_us"),
          unix_micros(col("t_view")).as("t_view_us"),
          unix_micros(col("t_purchase")).as("t_purchase_us"),
          col("steps_completed"))
        .orderBy(col("user_id")),
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |s0 AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t0
             |  FROM events GROUP BY user_id),
             |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
             |  WHERE e.event_type = 'view' AND s0.t0 IS NOT NULL AND e.ts >= s0.t0
             |  GROUP BY e.user_id),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
             |  GROUP BY e.user_id)
             |SELECT u.user_id,
             |  epoch_us(s0.t0) AS t_signup_us,
             |  epoch_us(s1.t1) AS t_view_us,
             |  epoch_us(s2.t2) AS t_purchase_us,
             |  CASE WHEN s0.t0 IS NULL THEN 0 WHEN s1.t1 IS NULL THEN 1
             |       WHEN s2.t2 IS NULL THEN 2 ELSE 3 END AS steps_completed
             |FROM u LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
             |  LEFT JOIN s2 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // ---- weekly signup-cohort retention: users whose first signup falls
    //      in week W, and how many of them have ANY event in days [7, 14)
    //      after that first signup. Timestamp arithmetic at epoch micros
    //      (integer) on both engines; date_trunc('week') is ISO-Monday in
    //      both. ----
    QDef("q69_retention",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val first = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
        val retained = ev.select(col("user_id"), col("ts"))
          .join(first, Seq("user_id"))
          .filter(unix_micros(col("ts")) >= unix_micros(col("t0")) + lit(7L * 86400000000L) &&
            unix_micros(col("ts")) < unix_micros(col("t0")) + lit(14L * 86400000000L))
          .select(col("user_id")).distinct()
          .withColumn("__r", lit(1))
        first.join(retained, Seq("user_id"), "left")
          .groupBy(date_trunc("week", col("t0")).cast("date").as("cohort_week"))
          .agg(count(lit(1)).as("n_users"),
            count(col("__r")).as("n_retained"))
          .orderBy(col("cohort_week"))
      },
      Some("""WITH first AS (SELECT user_id, min(ts) AS t0 FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |retained AS (SELECT DISTINCT f.user_id
             |  FROM events e JOIN first f USING (user_id)
             |  WHERE epoch_us(e.ts) >= epoch_us(f.t0) + 7 * 86400000000
             |    AND epoch_us(e.ts) < epoch_us(f.t0) + 14 * 86400000000)
             |SELECT CAST(date_trunc('week', f.t0) AS DATE) AS cohort_week,
             |  count(*) AS n_users,
             |  count(r.user_id) AS n_retained
             |FROM first f LEFT JOIN retained r ON f.user_id = r.user_id
             |GROUP BY 1 ORDER BY cohort_week""".stripMargin)),

    // ---- RANGE-frame trailing window (vs q10's ROWS frames): per
    //      customer, 7-day trailing revenue by VALUE range over the order
    //      date's day number — days with no orders still age out of the
    //      frame, which a ROWS frame cannot express. Integer-cents sum:
    //      round(x*100) lands ~1e-9 from an integer (never near a .5
    //      midpoint), so both engines agree; a double→DECIMAL cast does
    //      NOT (the r5 driver gate proved it diverges across DuckDB
    //      builds even when the local pair agrees). ----
    QDef("q70_range_frame",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("__day"))
          .rangeBetween(-6, 0)
        Tables.orders(s, dir)
          .withColumn("__day", unix_date(col("o_orderdate").cast("date")).cast("long"))
          .withColumn("rev_7d_cents",
            sum(round(col("o_totalprice") * lit(100)).cast("long")).over(w))
          .select(col("o_orderkey"), col("o_custkey"), col("rev_7d_cents"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev_7d_cents
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- lag(): per-user inter-event gap in micros (the think-time
    //      signal sessionization thresholds are tuned from). (ts,
    //      event_id) is a total order so the previous-row choice is
    //      deterministic; first event per user has a null gap. ----
    QDef("q72_event_gaps",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .select(col("user_id"), col("event_id"), col("gap_us"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // ---- explicit GROUPING SETS with grouping() indicators — the
    //      irregular lattice rollup (q17) and cube (q39) can't express:
    //      totals by segment, by year, and overall, but never the
    //      (segment, year) cross. ----
    QDef("q73_grouping_sets",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        Tables.customer(s, dir).createOrReplaceTempView("customer")
        s.sql("""SELECT c_mktsegment, order_year,
                |  count(*) AS n,
                |  CAST(grouping(c_mktsegment) AS INT) AS g_seg,
                |  CAST(grouping(order_year) AS INT) AS g_year
                |FROM (SELECT o.*, year(o_orderdate) AS order_year, c_mktsegment
                |      FROM orders o JOIN customer c ON o_custkey = c_custkey)
                |GROUP BY GROUPING SETS ((c_mktsegment), (order_year), ())
                |ORDER BY g_seg, g_year, c_mktsegment NULLS FIRST,
                |  order_year NULLS FIRST""".stripMargin)
      },
      Some("""SELECT c_mktsegment, order_year,
             |  count(*) AS n,
             |  CAST(grouping(c_mktsegment) AS INT) AS g_seg,
             |  CAST(grouping(order_year) AS INT) AS g_year
             |FROM (SELECT o.*, year(o_orderdate) AS order_year, c_mktsegment
             |      FROM orders o JOIN customer c ON o_custkey = c_custkey)
             |GROUP BY GROUPING SETS ((c_mktsegment), (order_year), ())
             |ORDER BY g_seg, g_year, c_mktsegment NULLS FIRST,
             |  order_year NULLS FIRST""".stripMargin)),

    // ---- SCD2 interval build (gaps-and-islands): the events changelog
    //      collapsed to per-user validity intervals of the event_type
    //      attribute. Everything (run boundary, version, interval end,
    //      run length) derives from ONE window partitioning by key —
    //      see operators/Scd.scala for why no (key, version) groupBy. ----
    QDef("q92_scd2_intervals",
      (s, dir) => graft.operators.Scd.scd2FromChangelog(
          Tables.events(s, dir), "user_id", "ts", "event_id", "event_type")
        .orderBy(col("user_id"), col("version")),
      Some(
        """WITH w AS (
          |  SELECT user_id, event_type, ts, event_id,
          |    CASE WHEN row_number() OVER pk = 1
          |      OR lag(event_type) OVER pk IS DISTINCT FROM event_type
          |      THEN 1 ELSE 0 END AS changed,
          |    row_number() OVER pk AS rn,
          |    count(*) OVER (PARTITION BY user_id) AS n_rows
          |  FROM events
          |  WINDOW pk AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |v AS (
          |  SELECT user_id, event_type, ts, changed, rn, n_rows,
          |    sum(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version,
          |    min(CASE WHEN changed = 1 THEN ts END) OVER fut AS valid_to,
          |    min(CASE WHEN changed = 1 THEN rn END) OVER fut AS next_rn
          |  FROM w
          |  WINDOW fut AS (PARTITION BY user_id ORDER BY ts, event_id
          |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
          |SELECT user_id, event_type, ts AS valid_from, valid_to,
          |  CAST(version AS BIGINT) AS version,
          |  CAST(coalesce(next_rn, n_rows + 1) - rn AS BIGINT) AS n_events,
          |  valid_to IS NULL AS is_current
          |FROM v WHERE changed = 1
          |ORDER BY user_id, version""".stripMargin)),

    // ---- relational set ops: INTERSECT / EXCEPT as customer retention
    //      vs churn between two order years. Spark plans both as a
    //      distinct aggregate feeding a left-semi / left-anti join — the
    //      same shuffle-by-key shape as q05/q06, never a cross product. ----
    QDef("q93_set_ops",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        def keys(y: Int) = o.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
        keys(1996).intersect(keys(1997)).withColumn("status", lit("retained"))
          .unionByName(keys(1996).except(keys(1997)).withColumn("status", lit("churned")))
          .orderBy(col("status"), col("o_custkey"))
      },
      Some(
        """SELECT o_custkey, 'retained' AS status FROM (
          |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          |  INTERSECT
          |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
          |UNION ALL
          |SELECT o_custkey, 'churned' AS status FROM (
          |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          |  EXCEPT
          |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
          |ORDER BY status, o_custkey""".stripMargin)),

    // ---- unpivot (wide -> long): per-part metrics melted to
    //      (key, metric, value) rows — Spark's native Unpivot node, a
    //      zero-shuffle projection-time expansion (each input row emits
    //      its metric rows map-side; the only wide op is the final
    //      ORDER BY the gate requires). ----
    QDef("q94_unpivot",
      (s, dir) => Tables.part(s, dir)
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"), col("p_retailprice")),
          "metric", "value")
        .orderBy(col("p_partkey"), col("metric")),
      Some(
        """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
          |UNION ALL
          |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
          |ORDER BY p_partkey, metric""".stripMargin)),

    // ---- schema-ful JSON parsing (q97): from_json with an explicit
    //      struct schema (vs q18's regex probe) — typed extraction stays
    //      inside codegen, malformed/missing keys become NULLs that the
    //      count/sum aggregates then expose. ----
    QDef("q97_json_agg",
      (s, dir) => {
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        Tables.events(s, dir)
          .select(col("event_type"),
            from_json(col("props"), StructType(Seq(StructField("k", LongType))))
              .getField("k").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            count(col("k")).cast("long").as("n_with_k"),
            sum(col("k")).cast("long").as("sum_k"),
            min(col("k")).cast("long").as("min_k"),
            max(col("k")).cast("long").as("max_k"))
          .orderBy(col("event_type"))
      },
      Some(
        """SELECT event_type, count(*) AS n,
          |  count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
          |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
          |  CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
          |  CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- ntile deciles (q98): corpus-curation's "top decile by length
    //      per language" — ntile semantics (earlier buckets one larger on
    //      remainder) match across engines GIVEN a total order, so the
    //      sort carries doc_id as tiebreak. ----
    QDef("q98_ntile_deciles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"),
            ntile(10).over(Window.partitionBy(col("lang"))
              .orderBy(col("n_chars"), col("doc_id"))).cast("long").as("decile"))
          .orderBy(col("doc_id"))
      },
      Some(
        """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
          |  CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS decile
          |FROM documents ORDER BY doc_id""".stripMargin)))
}
