package graft

import graft.sources.Sources
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-layout behaviors that carry the 100 TB story: partition
  * pruning on the preprocess layout and bucketed (shuffle-free) joins.
  */
class ScaleLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    root.collect { case s: FileSourceScanExec => s }
  }

  test("partitioned parquet layout prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    val df = (1 to 1000).map(i => (i.toLong, 2020 + i % 3, 1 + i % 12, s"v$i"))
      .toDF("id", "scrape_year", "scrape_month", "v")
    Sources.writeParquet(df, s"$dir/t", Seq("scrape_year", "scrape_month"))

    val pruned = spark.read.parquet(s"$dir/t")
      .filter($"scrape_year" === 2021 && $"scrape_month" === 2)
    val scan = scans(pruned).head
    assert(scan.partitionFilters.nonEmpty, "partition filters must reach the scan")
    // the scan's own pruned listing must select fewer files than exist
    val selected = scan.selectedPartitions.totalNumberOfFiles
    val allFiles = spark.read.parquet(s"$dir/t").inputFiles.length
    assert(selected > 0 && selected < allFiles,
      s"pruned read must touch fewer files ($selected vs $allFiles)")
    assert(pruned.count() ===
      df.filter($"scrape_year" === 2021 && $"scrape_month" === 2).count())
  }

  test("z-ordered layout skips row groups for box filters (measured, not planned)") {
    import graft.sources.Layout
    val dir = Files.createTempDirectory("graft_zorder").toString
    val n = 200000L
    // two pseudo-random independent dimensions in [0, 1024)
    val df = spark.range(n).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("y"))
    df.write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(s"$dir/plain")
    Layout.writeZOrdered(df, s"$dir/zorder", "x", "y",
      blockBytes = 256 * 1024)

    def readBox(path: String): (Long, Metrics.TaskTotals) =
      Metrics.measure(spark) {
        spark.read.parquet(path)
          .filter(col("x") < 32 && col("y") < 32).count()
      }
    val (nPlain, mPlain) = readBox(s"$dir/plain")
    val (nZ, mZ) = readBox(s"$dir/zorder")
    assert(nPlain === nZ, "layout must never change the answer")
    assert(mPlain.inputRecords >= n * 9 / 10,
      s"insertion order cannot skip: $mPlain")
    assert(mZ.inputRecords < mPlain.inputRecords / 4,
      s"z-order must skip most row groups: z=$mZ plain=$mPlain")
  }

  test("rowGroupStats: footer audit proves the z-order layout statically") {
    import graft.sources.Layout
    val dir = Files.createTempDirectory("graft_rgstats").toString
    val n = 200000L
    val df = spark.range(n).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("y"))
    df.write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(s"$dir/plain")
    Layout.writeZOrdered(df, s"$dir/zorder", "x", "y",
      blockBytes = 256 * 1024)

    def audit(path: String): Array[(String, Int, Long, Long, Long)] =
      Layout.rowGroupStats(spark, path, Seq("x", "y"))
        .groupBy("file", "row_group")
        .agg(max("n_rows").as("n_rows"),
          sum(expr("cast(max_val as long) - cast(min_val as long)")).as("range_sum"),
          count(lit(1)).as("n_cols"))
        .as[(String, Int, Long, Long, Long)].collect()

    val plain = audit(s"$dir/plain")
    val z = audit(s"$dir/zorder")
    // both audits see every row and both stat columns per group
    assert(plain.map(_._3).sum === n && z.map(_._3).sum === n)
    assert(plain.forall(_._5 === 2L) && z.forall(_._5 === 2L))
    assert(z.length > 4, s"z-order file should carry many row groups, got ${z.length}")
    // the z-ordered layout's per-row-group (x range + y range) boxes are
    // structurally tighter — the static fact behind the measured skipping
    val avgPlain = plain.map(_._4).sum / plain.length
    val avgZ = z.map(_._4).sum / z.length
    assert(avgZ * 2 < avgPlain,
      s"z-order min/max boxes must be tighter: z=$avgZ plain=$avgPlain")
  }

  test("ORC source/sink: partitioned round-trip, partition pruning, predicate pushdown") {
    import graft.sources.Sources
    import org.apache.spark.sql.DataFrame
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("orc_rt").toString
    Sources.writeOrc(docs, dir, Seq("lang"))
    // explicit schema, the production contract (partition column last —
    // the on-disk layout's column order)
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema.filter(_.name != "lang") :+ docs.schema("lang"))
    def read() = Sources.readOrc(spark, dir, schema)
    // byte-identical content across the round trip (modulo column order)
    val cols = docs.columns.sorted.toSeq
    assert(read().selectExpr(cols: _*).orderBy("doc_id").collect().toSeq ===
      docs.selectExpr(cols: _*).orderBy("doc_id").collect().toSeq)
    // AQE-safe scan extraction (the file-helper pattern; these reads are
    // over a temp dir, so the shared sf-path helper doesn't apply)
    def scanOf(df: DataFrame): FileSourceScanExec = {
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      root.collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(fail(s"no file scan in plan:\n$root"))
    }
    // partition pruning: a lang filter must reach the scan's partition filters
    val scan = scanOf(read().filter(col("lang") === "en"))
    assert(scan.metadata("PartitionFilters").contains("lang"),
      s"lang filter not pruning partitions: ${scan.metadata}")
    // predicate pushdown into the stripe reader
    val filtered = read().filter(col("doc_id") < 10)
    assert(scanOf(filtered).metadata("PushedFilters").contains("doc_id"),
      s"doc_id filter not pushed to ORC: ${scanOf(filtered).metadata}")
    assert(filtered.count() === 10)
  }

  test("rangeBoundaries/assignRangePartition: histogram-planned cuts balance a skewed layout") {
    import graft.sources.Layout
    // lognormal-ish skew: v = i^2 mod large — deterministic, heavy tail
    val vals = (0L until 20000L).map(i => (i, (i * i) % 999983L))
    val df = vals.toDF("id", "v")
    val bounds = Layout.rangeBoundaries(df, "v", 8)
    assert(bounds.length === 7 && bounds == bounds.sorted)
    val sizes = Layout.assignRangePartition(df, "v", bounds)
      .groupBy("range_part").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet === (0 to 7).toSet, s"every partition populated: $sizes")
    // log-bucket granularity is ~3 percent plus boundary rounding; the
    // point is no partition carries a multiple of its share
    val ideal = 20000.0 / 8
    assert(sizes.values.forall(n => n < ideal * 1.5 && n > ideal * 0.5),
      s"range partitions out of balance: $sizes")
    // assignment semantics: part = count of boundaries <= v, exactly
    val checkRows = Layout.assignRangePartition(df, "v", bounds)
      .as[(Long, Long, Int)].collect()
    checkRows.foreach { case (_, v, part) =>
      assert(part === bounds.count(_ <= v), s"v=$v part=$part bounds=$bounds")
    }
    // a value carrying more than a partition's share collapses adjacent
    // cuts onto itself: empty partitions downstream, never an error
    val heavy = ((0L until 100L).map(i => (i, i)) ++
      (100L until 1000L).map(i => (i, 77L))).toDF("id", "v")
    val hb = Layout.rangeBoundaries(heavy, "v", 4)
    assert(hb.distinct.length < hb.length,
      s"duplicate cuts expected on a dominant value: $hb")
    val hSizes = Layout.assignRangePartition(heavy, "v", hb)
      .groupBy("range_part").count().as[(Int, Long)].collect().toMap
    assert(hSizes.values.sum === 1000L)
  }

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse dir (static conf); tables dropped in finally
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    (1 to 10000).map(i => (i.toLong % 500, s"f$i")).toDF("k", "payload")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("fact_b")
    (0 until 500).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("dim_b")

    val joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
    // disable broadcast so the join would shuffle if bucketing didn't align
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS fact_b")
      spark.sql("DROP TABLE IF EXISTS dim_b")
    }
  }

  test("SQL surface exposes the native expressions (GraftExtensions)") {
    val out = spark.sql(
      """SELECT lang_id('the cat sat on the mat and it was happy') AS l,
        |       sentiment('the room was great and clean') AS s,
        |       size(word_shingles('a b c d', 2)) AS n,
        |       simhash64(word_shingles('a b c d', 2)) AS h""".stripMargin)
      .as[(String, String, Int, Long)].head()
    assert(out._1 === "en")
    assert(out._2 === "pos")
    assert(out._3 === 3)
  }

  test("SQL surface: token_count, char_shingles, quantize_int8, hyperplane_sig") {
    val out = spark.sql(
      """SELECT token_count(' a  b c ') AS tc,
        |       size(char_shingles('abcd', 3)) AS cs,
        |       char_shingles(NULL, 3) AS csn,
        |       quantize_int8(array(0.5f, -1.0f)).q AS q,
        |       hyperplane_sig(array(1.0f, 0.0f, 0.0f, 1.0f), 4, 16, 42) AS sig""".stripMargin)
      .as[(Int, Int, Seq[String], Seq[Int], Long)].head()
    assert(out._1 === 3)
    assert(out._2 === 2, "abc, bcd")
    assert(out._3 === Seq.empty, "null text -> empty shingle set")
    assert(out._4 === Seq(64, -127), "max |x| = 1.0 -> scale 127")
    // must agree with the Scala API (same baked planes)
    val viaApi = spark.range(1).select(
      graft.functions.expr.HyperplaneSig.hyperplane_sig(
        org.apache.spark.sql.functions.array(
          Seq(1.0f, 0.0f, 0.0f, 1.0f).map(org.apache.spark.sql.functions.lit): _*),
        4, 16, 42L).as("sig")).as[Long].head()
    assert(out._5 === viaApi)
  }
}
