package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Readers/writers for the engine's edge formats (SURVEY.md §2.1).
  *
  * The reference reads every CSV with `header, inferSchema, multiLine,
  * escape='"', ignoreLeadingWhiteSpace` (`apps/preprocess_data.py:84`,
  * `apps/process_reviews.py:88`) and re-infers schemas on every re-read —
  * which drifted column types between runs (SURVEY §1.3). Here CSV reads
  * take an explicit schema and inference exists only as an opt-in.
  */
object Sources {

  /** S1 options bundle: quoted multiline text fields with embedded quotes
    * (the reference's Airbnb `comments`/`description` columns).
    */
  val csvOptions: Map[String, String] = Map(
    "header" -> "true",
    "multiLine" -> "true",
    "escape" -> "\"",
    "ignoreLeadingWhiteSpace" -> "true")

  /** S1: CSV scan with explicit schema (production path — no inference). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(csvOptions ++ extra).schema(schema).csv(path)

  /** S1 (exploratory): inferred-schema CSV read, the reference's default.
    * Kept for parity; production stages pass explicit schemas.
    */
  def readCsvInferred(spark: SparkSession, path: String,
                      extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(csvOptions ++ extra)
      .option("inferSchema", "true").csv(path)

  /** Audited CSV scan — [[readJsonlAudited]]'s twin for the format where
    * the reference actually hit load corruption (its Redshift COPY died
    * on malformed Airbnb CSV rows and the postmortem went through
    * `stl_load_errors`; `README.md:216-217`, notebook cell 38). Returns
    * `(good, bad)`: `good` rows parsed against the explicit schema,
    * `bad` the raw text of every row that did not parse (wrong field
    * count, uncloseable quote, type-cast failure), for quarantine and
    * forensics — the in-engine `stl_load_errors`. PERMISSIVE mode with
    * an explicit corrupt-record column; the caller counts `bad` as its
    * ingest quality gate. Same one-scan + two-complementary-filters
    * shape (and the same cache requirement) as the JSONL form.
    */
  def readCsvAudited(spark: SparkSession, path: String, schema: StructType,
                     extra: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    val corruptCol = "_corrupt_record"
    require(!schema.fieldNames.contains(corruptCol),
      s"readCsvAudited: schema already has $corruptCol")
    val raw = spark.read
      .options(csvOptions ++ extra)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .csv(path)
      // same parse-time-column caveat as readJsonlAudited: filtering on
      // the corrupt-record column alone is rejected unless the parsed
      // frame is cached first
      .cache()
    val good = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val bad = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (good, bad)
  }

  /** S6: CSV sink (quoted, header) — `df.write.csv(path, escape='"',
    * header="true")` in the reference (`apps/process_listings_hosts.py:127`).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("escape", "\"").option("header", "true")
      .csv(path)

  /** S9: JDBC warehouse sink — the reference's `S3ToRedshiftOperator`
    * contract (`plugins/operators/s3_to_redshift_operator.py:83-103`):
    * each model table is TRUNCATED, then bulk-loaded, so a re-run of the
    * publish stage is idempotent and readers never see a half-table
    * under a dropped/recreated name. `truncate=true` + overwrite is
    * exactly that: Spark issues TRUNCATE (keeping the warehouse's DDL,
    * grants, and sort/dist attributes — the reason the reference
    * truncates instead of dropping) and appends the batch;
    * `truncate=false` falls back to drop-and-recreate for a first
    * deploy. `batchsize` bounds per-round-trip row batches; real
    * Redshift loads route through COPY, so this sink is for
    * JDBC-reachable marts — the engine's primary serving path stays
    * in-engine (SURVEY §2.1).
    *
    * Scale shape: each partition opens one connection and streams its
    * rows — parallelism = upstream partitions, no driver-side collect.
    * Coalesce upstream if the warehouse caps concurrent connections.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties,
                truncate: Boolean = true, batchSize: Int = 10000): Unit = {
    require(batchSize > 0, s"writeJdbc: batchSize must be positive, got $batchSize")
    df.write.mode("overwrite")
      .option("truncate", truncate.toString)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
  }

  /** S9 read side ([[writeJdbc]]'s round-trip partner): predicate-free
    * single-partition read for small marts; pass `partitionColumn`
    * bounds via `props`/options upstream for big ones.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S5: partitioned parquet sink (`apps/preprocess_data.py:95-97`). */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** ORC twins of the parquet source/sink — the format a Hive-heritage
    * warehouse hands over. Same columnar contract as [[readCsv]]
    * (EXPLICIT schema — re-inference drifts types run to run, the
    * module's founding lesson; partition pruning; predicate pushdown
    * into the stripe reader — ScaleLayoutSpec asserts both), so a
    * pipeline can ingest ORC drops and publish parquet (or vice versa)
    * without touching any operator.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Exploratory inferred-schema ORC read ([[readCsvInferred]]'s twin);
    * production stages pass explicit schemas. */
  def readOrcInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  /** S3: text-line scan + row-wise parse of delimiter-separated files with
    * free-form headers (the reference's ECA weather TXT:
    * `apps/preprocess_data.py:120-127` — strip blanks, split on ',',
    * keep only rows with exactly `cols.size` fields whose first field is
    * not the header marker). Pure DataFrame ops — the reference's RDD
    * lambdas would ship per-row closures; this stays in codegen.
    */
  def readDelimitedLines(spark: SparkSession, glob: String,
                         cols: Seq[String]): DataFrame = {
    val fields = split(regexp_replace(col("value"), " ", ""), ",")
    val parsed = spark.read.text(glob)
      .select(fields.as("f"))
      .filter(size(col("f")) === cols.size &&
        upper(col("f").getItem(0)) =!= cols.head.toUpperCase)
    cols.zipWithIndex.foldLeft(parsed) { case (d, (c, i)) =>
      d.withColumn(c, col("f").getItem(i))
    }.drop("f")
  }

  /** JSONL corpus scan (one JSON record per line) with explicit schema —
    * the interchange format raw text corpora usually ship in before
    * parquet conversion. No inference in the production path (same drift
    * rationale as CSV), and multiline JSON is deliberately unsupported:
    * line-delimited records are what keeps the scan splittable, so a
    * 100 TB corpus parallelizes by byte ranges instead of whole files.
    *
    * Default parse mode is FAILFAST, matching the engine's loud-failure
    * stance: Spark's PERMISSIVE default turns a corrupt line into an
    * all-null row, and a null-text doc then silently vanishes from
    * downstream dedup instead of surfacing the corruption. Pass
    * `mode = "PERMISSIVE"` (with a corrupt-record column in the schema)
    * only when quarantining bad lines deliberately.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                mode: String = "FAILFAST"): DataFrame =
    spark.read.option("mode", mode).schema(schema).json(path)

  /** Audited JSONL scan for untrusted corpora (web crawls ship malformed
    * lines as a fact of life, and FAILFAST on line 3 billion of a batch
    * is not a strategy): returns `(good, bad)` — `good` rows parsed
    * against the explicit schema, `bad` the raw text of every line that
    * did not parse, for quarantine/forensics. PERMISSIVE mode with an
    * explicit corrupt-record column; a malformed line yields nulls in
    * every data column and the raw line in the audit column, so the split
    * is one scan + two complementary filters. The caller counts `bad` as
    * its ingest quality gate (the reference's Airflow-gate pattern).
    */
  def readJsonlAudited(spark: SparkSession, path: String,
                       schema: StructType): (DataFrame, DataFrame) = {
    val corruptCol = "_corrupt_record"
    require(!schema.fieldNames.contains(corruptCol),
      s"readJsonlAudited: schema already has $corruptCol")
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .json(path)
      // Spark requires caching/materialization before filtering on the
      // corrupt-record column alone (it is populated at parse time, and a
      // query referencing ONLY it would otherwise skip parsing the data
      // columns entirely and raise AnalysisException)
      .cache()
    val good = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val bad = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (good, bad)
  }

  /** JSONL sink (one record per line, gzip-friendly downstream). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Training-shard sink: the pipeline's last mile. Writes
    * `partitionCols`-partitioned parquet (typically the train/val/test
    * split label) with every shard file capped at `maxRecordsPerShard`
    * rows, rows laid out in `orderCols` order WITHIN each shard.
    *
    * Why each knob matters at 100 TB:
    *  - `maxRecordsPerFile` bounds shard size so downstream loaders can
    *    stream fixed-size work units regardless of upstream partition
    *    skew — one hot partition otherwise emits one multi-TB file;
    *  - `sortWithinPartitions` is a per-task sort (no global shuffle, no
    *    range exchange) that makes shard contents deterministic given a
    *    deterministic upstream partitioning, and clusters rows for
    *    delta/dictionary encodings (parquet pages compress against their
    *    neighbors);
    *  - partitioned layout means a trainer reading one split prunes the
    *    others at the directory level.
    */
  def writeShards(df: DataFrame, path: String, partitionCols: Seq[String],
                  orderCols: Seq[String], maxRecordsPerShard: Long): Unit = {
    require(maxRecordsPerShard > 0,
      s"writeShards: maxRecordsPerShard must be positive, got $maxRecordsPerShard")
    df.sortWithinPartitions((partitionCols ++ orderCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerShard)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** S4: literal/local-collection source (the reference's 4-row station
    * lookup, `apps/preprocess_data.py:141-145`).
    */
  def literal(spark: SparkSession, rows: Seq[(Int, String)],
              names: (String, String)): DataFrame = {
    import spark.implicits._
    rows.toDF(names._1, names._2)
  }

  /** F2/F3 analog: provenance column from the input file path — segment at
    * `depth` from the end (`element_at(split(input_file_name(),"/"), -depth)`,
    * `apps/preprocess_data.py:101,111`).
    */
  def pathSegment(depth: Int) =
    element_at(split(input_file_name(), "/"), -depth)
}
