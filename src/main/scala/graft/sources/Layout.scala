package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the lakehouse
  * Z-ORDER: interleave the bits of two clustering keys into one Morton
  * code and lay rows out in that order, so parquet row-group min/max
  * stats become tight boxes in BOTH dimensions and a selective filter on
  * EITHER key (or both) skips most of the file without reading it.
  * Sorting by (a, b) instead clusters only `a`; filters on `b` alone
  * then read everything.
  *
  * At 100 TB this is the difference between "the filter reached the scan"
  * (plan-level pushdown, which Catalyst already does) and "the scan
  * skipped the data" (layout-level pruning, which only the writer can
  * arrange). ScaleLayoutSpec measures the effect with runtime task
  * metrics: the same box filter reads ~an order of magnitude fewer rows
  * from a z-ordered file than from an insertion-ordered one.
  */
object Layout {

  /** Morton/Z-value of two non-negative keys, `bits` bits each (default
    * 16 -> a 32-bit code). Pure bit arithmetic on BIGINT — composed from
    * codegen'd built-ins and exactly replayable in any engine's SQL.
    * Keys wider than `bits` bits must be range-reduced first (bucketed or
    * shifted): the interleave masks to `bits` to keep the code total.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits in [1,31], got $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Writes `df` as parquet laid out in z-order of (`colA`, `colB`):
    * range-partitioned then sorted by the Morton code inside each task,
    * with a bounded parquet block size so files carry many small
    * row groups (pruning granularity). The z column itself is not
    * written.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int = 16, blockBytes: Long = 1L << 20): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .parquet(path)

  /** Row-group-level layout audit of a parquet dataset: one row per
    * (file, row group, column) with the row count, compressed bytes, and
    * the column's min/max statistics — the numbers that decide whether a
    * selective filter will SKIP data at scan time (tight, disjoint
    * min/max boxes) or read everything (every row group's range spans the
    * domain). [[writeZOrdered]] exists to produce the former;
    * ScaleLayoutSpec measures the effect dynamically with task metrics;
    * this is the STATIC view — the audit a table-maintenance job runs
    * after a compaction/clustering rewrite to prove the layout, without
    * running a query against it.
    *
    * Scale shape: the file listing parallelizes across the cluster and
    * each task reads only FOOTERS (KBs per file, never data pages); the
    * output is metadata-sized. Min/max surface as strings (parquet
    * statistics are type-erased at this level; the audit compares ranges
    * and overlap, not exact values).
    */
  def rowGroupStats(spark: org.apache.spark.sql.SparkSession, path: String,
                    statCols: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    // the SESSION's Hadoop conf, not a blank one — spark.hadoop.* settings
    // (s3a credentials, endpoints, defaultFS) must reach both the driver
    // listing and the executor-side footer reads; Configuration is not
    // serializable, so ship its entries and rebuild per task
    val conf = spark.sparkContext.hadoopConfiguration
    val confEntries = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, conf)
    val files = {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath.toString
      }
      buf.toSeq
    }
    val cols = statCols
    spark.sparkContext
      .parallelize(files, math.min(files.size.max(1), spark.sparkContext.defaultParallelism))
      .flatMap { file =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(file), c))
        try {
          val blocks = reader.getFooter.getBlocks
          (0 until blocks.size()).flatMap { g =>
            val b = blocks.get(g)
            val byName = b.getColumns.asScala
              .map(cc => cc.getPath.toDotString -> cc).toMap
            cols.flatMap { cn =>
              byName.get(cn).map { cc =>
                val st = cc.getStatistics
                val (mn, mx) =
                  if (st == null || !st.hasNonNullValue) (null: String, null: String)
                  else (st.minAsString(), st.maxAsString())
                (file.substring(file.lastIndexOf('/') + 1), g,
                  b.getRowCount, b.getCompressedSize, cn, mn, mx)
              }
            }
          }
        } finally reader.close()
      }
      .toDF("file", "row_group", "n_rows", "compressed_bytes", "col",
        "min_val", "max_val")
  }

  /** Small-file COMPACTION plan: assign items (files, or rows standing in
    * for them) to target-sized bins within each group, deterministically.
    * The 100 TB failure mode this serves: a partitioned table accreted by
    * thousands of incremental writes degrades into millions of KB-scale
    * files, and every later scan pays per-file open/footer costs that
    * dwarf the data read. Compaction is the fix, and the PLAN — which
    * files merge into which output — is the part that must be
    * deterministic and cheap; the rewrite itself is a partitioned copy.
    *
    * Binning rule: within each group (ordered by `orderCol` — the
    * deterministic total order inside a group), bin(i) = floor(bytes of
    * all EARLIER items / targetBytes). A pure prefix-sum, so it is one
    * window over the group — no sequential first-fit state — and exactly
    * replayable in SQL. Bound: every bin's total is < targetBytes + the
    * group's largest single item (an item never splits), and every bin
    * except a group's last holds >= targetBytes - largest + 1 bytes.
    *
    * Scale shape: the window serializes per GROUP, which for a file
    * inventory is the partition directory — thousands of groups of
    * hundreds of files each, never one global order. Returns the input
    * plus a `bin` column.
    */
  def compactionPlan(items: DataFrame, groupCols: Seq[String],
                     orderCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"compactionPlan: targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    items
      // sum() over an empty frame (first row) is null -> bytes-before 0.
      .withColumn("__before", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      // `div`, not `/`: integer floor-division — a double quotient cast
      // back to long is the cross-engine instability the plan must not have.
      .withColumn("bin", expr(s"__before div ${targetBytes}L"))
      .drop("__before")
  }

  /** Execute a compaction plan as a sharded write: rows are binned by
    * [[compactionPlan]] (using `bytesCol` as the per-row serialized-size
    * estimate), shuffled ONCE on (group, bin), and written partitioned by
    * `groupCols` + `bin` — each bin is a single file of ~`targetBytes`,
    * whatever the input's file fragmentation was. (`bin` rides along as a
    * directory-level partition column — that is what pins "one bin = one
    * file" even when several bins hash into the same write task; readers
    * that don't want it drop it on read.) Directory layout and file
    * contents are deterministic; contents are ordered by `orderCol`
    * within each shard (sortWithinPartitions — no global sort exchange).
    */
  def writeCompacted(df: DataFrame, path: String, groupCols: Seq[String],
                     orderCol: String, bytesCol: String,
                     targetBytes: Long): Unit = {
    val planned = compactionPlan(df, groupCols, orderCol, bytesCol, targetBytes)
    planned
      .repartition((groupCols.map(col) :+ col("bin")): _*)
      .sortWithinPartitions((groupCols.map(col) :+ col("bin") :+ col(orderCol)): _*)
      .write.mode("overwrite")
      .partitionBy(groupCols :+ "bin": _*)
      .parquet(path)
  }

  /** Equi-depth range-partition boundaries from the log-histogram sketch
    * ([[graft.operators.Quantiles]]) — the planning half of a balanced
    * range layout (range-partitioned writes, a merge-sorted export,
    * boundary-driven bucketing) WITHOUT the extra sampling pass Spark's
    * `repartitionByRange` schedules: the histogram is one
    * map-side-combinable aggregation into <= `Quantiles.MaxBuckets` rows
    * total — and since that same state is the persistable/mergeable q102
    * form, boundaries for tomorrow's 100 TB write can come from
    * yesterday's persisted counts for free.
    *
    * Returns the `numPartitions - 1` ascending cut values — quantile-
    * bucket representatives at permilles `i * 1000 / numPartitions` —
    * computed by the same integer readout rule as q96/q102, so the plan
    * is engine-stable. Granularity caveats, both inherent: bucket width
    * is ~3% (2^(1/32) log-buckets), and a single value that carries more
    * than a partition's share of rows cannot be split by ANY boundary
    * choice (adjacent cuts collapse onto it; downstream sees an empty
    * partition, not an error). Values must be nonnegative longs (the
    * histogram's contract).
    */
  def rangeBoundariesFromCounts(counts: DataFrame, numPartitions: Int): Seq[Long] = {
    import graft.operators.Quantiles
    require(numPartitions >= 2 && numPartitions <= 1000,
      s"rangeBoundariesFromCounts: numPartitions in [2, 1000], got $numPartitions")
    val qs = (1 until numPartitions).map(i => i * 1000 / numPartitions)
      .distinct.filter(_ > 0)
    // one shared collect-into-registers readout (duplicate bucket rows
    // sum — a union of persisted increment states reads like its merge)
    Quantiles.readoutFromCounts(counts, qs)
  }

  /** One-pass convenience over raw values: histogram + readout. */
  def rangeBoundaries(df: DataFrame, valueCol: String,
                      numPartitions: Int): Seq[Long] =
    rangeBoundariesFromCounts(
      graft.operators.Quantiles.histCountsGlobal(df, valueCol), numPartitions)

  /** Assign each row its range partition under `boundaries` (ascending):
    * `range_part` = number of boundaries <= value — a narrow codegen'd
    * fold over a literal array, no shuffle; feed it to
    * `repartition(col("range_part"))` + sortWithinPartitions or a
    * partitioned write to realize the balanced layout.
    */
  def assignRangePartition(df: DataFrame, valueCol: String,
                           boundaries: Seq[Long]): DataFrame = {
    require(boundaries == boundaries.sorted,
      "assignRangePartition: boundaries must be ascending")
    val bArr = array(boundaries.map(lit): _*)
    // explicit null-propagation: the fold's `otherwise(0)` would bin a
    // NULL value into partition 0; unknown stays unknown, matching
    // clipToQuantiles/robustOutliers' convention
    df.withColumn("range_part",
      when(expr(valueCol).isNotNull,
        aggregate(bArr, lit(0),
          (acc, b) => acc + when(expr(valueCol) >= b, 1).otherwise(0))))
  }

  /** Deterministic global shuffle + token-budget SHARDING of a training
    * corpus: every document gets a retry-stable pseudo-random position
    * (the FNV-1a hash of its id — the same RNG-free convention as the
    * sampling family), and contiguous runs of ~`budgetTokens` tokens in
    * that permuted order become one shard. This is the writer-side
    * operator a pretraining data loader needs: shards are (a) a
    * deterministic function of the doc set — same corpus, same shards,
    * on any cluster, any partitioning, any retry; (b) token-balanced
    * (every shard's payload is within one document of the budget); and
    * (c) well-mixed (hash order decorrelates neighbors, so a shard is
    * not a source/time slice — the "global shuffle" a naive
    * partitioned write by ingest order silently fails to provide).
    *
    * Output: `(doc_id, n_tokens, offset_tokens, shard)` where
    * `offset_tokens` is the exact number of tokens BEFORE the doc in the
    * global permuted order and `shard = offset_tokens div budgetTokens`.
    * A document larger than the budget occupies its start shard alone
    * and later shard ids simply skip — ids are stable, not dense.
    *
    * SCALE SHAPE — the reason this is not one big window: a global
    * cumulative sum over `ORDER BY hash` is a single-partition
    * WindowExec, the classic 100 TB scale-killer. Instead a two-level
    * prefix scan: the top `log2(scanBuckets)` bits of the hash are a
    * MONOTONE coarse prefix of the permuted order, so (1) per-bucket
    * token totals aggregate map-side into ≤ `scanBuckets` rows, (2) the
    * exclusive prefix over that tiny frame is the only single-partition
    * window (bounded by a PARAMETER, not the corpus), and (3) the
    * per-row scan runs in a window partitioned BY bucket — fully
    * parallel, one shuffle of the corpus on the bucket key. The oracle
    * replays the single-window form; the two agree exactly because the
    * bucket is an order prefix.
    *
    * Null or negative token counts fail loudly (a silent 0 would shift
    * every later offset — the one thing a deterministic layout must
    * never do quietly).
    */
  def trainingShards(df: DataFrame, idCol: String, tokenCol: String,
                     budgetTokens: Long, scanBuckets: Int = 1024): DataFrame = {
    require(budgetTokens > 0,
      s"trainingShards: budgetTokens must be positive, got $budgetTokens")
    require(scanBuckets >= 2 && scanBuckets <= (1 << 20) &&
      (scanBuckets & (scanBuckets - 1)) == 0,
      s"trainingShards: scanBuckets must be a power of two in [2, 2^20], got $scanBuckets")
    val bits = java.lang.Integer.numberOfTrailingZeros(scanBuckets)
    val toks = when(expr(tokenCol).isNull || expr(tokenCol) < 0,
      raise_error(concat(lit("trainingShards: null/negative token count for id "),
        col(idCol).cast("string"))))
      .otherwise(expr(tokenCol).cast("long"))
    val keyed = df.select(col(idCol).as("doc_id"), toks.as("n_tokens"))
      .withColumn("__k",
        graft.functions.expr.Fnv64.fnv64(col("doc_id").cast("string")))
      // arithmetic shift of the SIGNED hash: the bucket is monotone in
      // the (signed) sort key, which is what makes two-level == global
      .withColumn("__b", shiftright(col("__k"), 64 - bits))
    val bucketTotals = keyed.groupBy("__b").agg(sum("n_tokens").as("__bt"))
    val wPre = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = bucketTotals
      .withColumn("__off", coalesce(sum("__bt").over(wPre), lit(0L)))
      .select("__b", "__off")
    val wIn = Window.partitionBy("__b").orderBy(col("__k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(prefixes), "__b")
      .withColumn("offset_tokens",
        col("__off") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .withColumn("shard", expr(s"offset_tokens div $budgetTokens"))
      .select("doc_id", "n_tokens", "offset_tokens", "shard")
  }

  /** Per-shard balance audit of a [[trainingShards]] assignment:
    * `(shard, n_docs, shard_tokens, first_offset)` — the numbers a
    * loader checks before trusting a layout. Tiny output (one row per
    * shard). */
  def shardAudit(shards: DataFrame): DataFrame =
    shards.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("shard_tokens"),
        min("offset_tokens").as("first_offset"))

  /** Materialize a [[trainingShards]] assignment as a shard-partitioned
    * parquet dataset, rows sorted by their global offset inside each
    * shard file — the on-disk layout a sequential loader reads straight
    * through. One shuffle on the shard id. */
  def writeTrainingShards(shards: DataFrame, path: String): Unit =
    shards.repartition(col("shard"))
      .sortWithinPartitions(col("offset_tokens"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** BUCKETED-table write — the co-located-join layout. `bucketBy`
    * hash-partitions rows into `nBuckets` files per write task keyed on
    * `bucketCol` and records the bucket spec in the catalog; a later
    * equi-join (or aggregation) of two tables bucketed the same way on
    * the same key plans with ZERO Exchange on either side — the shuffle
    * happened once, at write time, and every subsequent join of the
    * tables reads it back for free. At 100 TB this is the difference
    * between re-shuffling two fact tables on every join of a daily
    * pipeline and paying the partitioning once at ingest
    * (PlanAuditSpec pins the no-Exchange plan and its non-vacuous
    * counterfactual: the same join over plain parquet shuffles both
    * sides).
    *
    * The table registers in the session catalog with an explicit
    * external `path` (warehouseDir/table), so re-runs are idempotent:
    * DROP + clear location + rewrite. `sortCols` adds `sortBy` so each
    * bucket file is sorted — a sort-merge join then skips the hash
    * table, and Spark's per-file sort still avoids any exchange (a
    * bucket written by several tasks re-sorts locally, never shuffles).
    *
    * Probe-backed (Scratch, 10M-row inputs, 200k keys, broadcast off):
    * three repeat joins of the bucketed tables = 0.43 s total vs 3.82 s
    * for the same three joins re-aggregating and shuffling plain frames
    * — the write-once shuffle amortizes ~9x by the third join, and the
    * gap widens with every further join of the same tables.
    */
  def writeBucketed(df: DataFrame, warehouseDir: String, table: String,
                    bucketCol: String, nBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 2 && nBuckets <= 4096,
      s"writeBucketed: nBuckets in [2, 4096], got $nBuckets")
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"writeBucketed: table must be a plain identifier, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // DROP on an external table leaves its files; clear the location so
    // stale buckets from a previous spec never survive into this write
    val loc = new org.apache.hadoop.fs.Path(s"$warehouseDir/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val base = df.write.mode("overwrite").format("parquet")
      .option("path", loc.toString)
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) base.sortBy(sortCols.head, sortCols.tail: _*)
     else base).saveAsTable(table)
  }
}
