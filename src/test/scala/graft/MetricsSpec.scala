package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("measure captures input records/bytes for a scan-only job") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val expected = df.count()
    val (got, m) = Metrics.measure(spark) {
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select(col("l_orderkey")).count()
    }
    assert(got === expected)
    assert(m.tasks > 0)
    assert(m.inputRecords === expected,
      s"scan should read exactly the row count, got $m")
    assert(m.inputBytes > 0)
  }

  test("measure sees shuffle volume for a wide job and none for a narrow one") {
    val data = (0 until 20000).map(i => (i % 97, s"v$i"))
    val (_, wide) = Metrics.measure(spark) {
      data.toDF("k", "v").groupBy("k")
        .agg(collect_list("v")) // no partial pushdown -> real shuffle payload
        .count()
    }
    assert(wide.shuffleWriteBytes > 0 && wide.shuffleReadBytes > 0,
      s"groupBy must shuffle, got $wide")
    val (_, narrow) = Metrics.measure(spark) {
      data.toDF("k", "v").filter(col("k") > 10).count()
    }
    // count()'s final single-row exchange is negligible next to the wide
    // job's payload; the narrow job must not move the data itself
    assert(narrow.shuffleWriteBytes < wide.shuffleWriteBytes / 10,
      s"narrow=$narrow wide=$wide")
  }

  test("runtime contract: bloom ingest shuffle volume tracks the batch, not the state") {
    def run(stateRows: Long): (Long, Metrics.TaskTotals) = {
      spark.range(0, stateRows).select(col("id").as("k"))
        .write.mode("overwrite").parquet("/tmp/metrics_state")
      val stateP = spark.read.parquet("/tmp/metrics_state")
      val batch = spark.range(stateRows - 1000, stateRows + 100)
        .select(col("id").as("k"))
      val bloom = graft.dedup.Ingest.buildBloom(stateP, "k", stateRows, 0.03)
      Metrics.measure(spark) {
        graft.dedup.Ingest.newRowsWithBloom(stateP, batch, "k", bloom).count()
      }
    }
    val (n1, m1) = run(50000)
    val (n4, m4) = run(200000)
    assert(n1 === 100 && n4 === 100)
    assert(m1.inputRecords >= 50000 && m4.inputRecords >= 200000,
      s"the state must actually be scanned: $m1 vs $m4")
    // same batch -> the shuffle payload (maybe-keys distinct + count rows)
    // must stay flat while the state quadruples
    assert(m4.shuffleWriteBytes < 2 * m1.shuffleWriteBytes + 1024,
      s"state-sized shuffle detected: $m1 vs $m4")
  }

  test("runtime contract: distributed bloom build ships ONE filter to the driver, flat in state size") {
    // a driver-side build (collect keys, put them in a filter) would make
    // the driver-bound result volume track state row count; the
    // BloomFilterAggregate build returns one merged filter whose size is a
    // function of (expectedKeys, fpp) only — so at a FIXED sizing, result
    // bytes must stay flat while the state quadruples
    def run(stateRows: Long): Metrics.TaskTotals = {
      spark.range(0, stateRows).select(col("id").as("k"))
        .write.mode("overwrite").parquet("/tmp/metrics_bloom_state")
      val stateP = spark.read.parquet("/tmp/metrics_bloom_state")
      val (_, m) = Metrics.measure(spark) {
        graft.dedup.Ingest.buildBloom(stateP, "k", expectedKeys = 50000, fpp = 0.03)
      }
      m
    }
    val m1 = run(50000)
    val m4 = run(200000)
    assert(m1.inputRecords >= 50000 && m4.inputRecords >= 200000,
      s"the state must actually be scanned: $m1 vs $m4")
    assert(m4.resultBytes < 2 * m1.resultBytes,
      s"driver-bound result volume must not track state size: $m1 vs $m4")
  }

  test("runtime contract: incremental dedup shuffle volume tracks the batch, not the state") {
    import graft.dedup.{MinhashState, NearDedup}
    // every doc uses its own vocabulary (tokens embed the doc id), so
    // growing the state adds NO new true matches for the fixed batch —
    // only then does "shuffle tracks the batch" isolate plan shape from
    // genuinely increased pair volume
    def corpus(ids: org.apache.spark.sql.DataFrame) = ids
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit(s"w${j}x"), col("id"))): _*).as("text"))
    def run(stateRows: Long): Metrics.TaskTotals = {
      val docs = corpus(spark.range(0, stateRows).toDF("id"))
      val st = NearDedup.minhashState(docs, "doc_id", "text",
        reuseSketches = false)
      st.buckets.write.mode("overwrite").parquet("/tmp/metrics_mb")
      st.sketches.write.mode("overwrite").parquet("/tmp/metrics_ms")
      val state = MinhashState(spark.read.parquet("/tmp/metrics_mb"),
        spark.read.parquet("/tmp/metrics_ms"))
      // batch: exact copies of state docs 0..49 under fresh ids
      val batch = corpus(spark.range(0, 50).toDF("id"))
        .withColumn("doc_id", col("doc_id") + 9000000L)
      val (_, m) = Metrics.measure(spark) {
        NearDedup.minhashPairsIncremental(state, batch, "doc_id", "text",
          reuseSketches = false).count()
      }
      m
    }
    val m1 = run(4000)
    val m4 = run(16000)
    // batch buckets and candidates broadcast; the state bucket index and
    // sketch frame stream map-side — quadrupling state must not grow the
    // shuffled bytes in step (allow slack for AQE stats rows)
    assert(m4.shuffleWriteBytes < 2 * m1.shuffleWriteBytes + 4096,
      s"state-sized shuffle detected: $m1 vs $m4")
  }

  test("runtime contract: span-dedup shuffle tracks windows, not text bytes") {
    import graft.dedup.SpanDedup
    // same token COUNT per doc (same window count), token LENGTH varied
    // 16x — the fingerprint triples that shuffle are fixed-width, so the
    // shuffled bytes must stay flat while the text bytes balloon
    def run(tokLen: Int): Metrics.TaskTotals = {
      val word = "x" * tokLen
      val docs = (0 until 200).map { i =>
        // 20 content groups of 10 docs -> plenty of cross-doc dup spans
        val toks = (0 until 50).map(t => s"$word${i % 20}t$t")
        (i.toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      val (_, m) = Metrics.measure(spark) {
        SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8).count()
      }
      m
    }
    val thin = run(4)
    val fat = run(64)
    assert(fat.shuffleWriteBytes < 2 * thin.shuffleWriteBytes + 4096,
      s"text-sized shuffle detected: thin=$thin fat=$fat")
  }

  test("runtime contract: distinct sketches shuffle O(state), countDistinct shuffles O(keys)") {
    import graft.functions.expr.Fnv64.fnv64
    import graft.operators.Sketches
    // 8x the rows AND 8x the distinct keys; sketch state is fixed
    // (k=256 longs / 2^8 registers per group), so its shuffle must stay
    // flat while exact countDistinct's partial-agg exchange grows with
    // the key space — the 100 TB argument for the sketches, in numbers.
    def hashes(nKeys: Int) = spark.range(0, nKeys, 1, 8)
      .select((col("id") % 4).cast("string").as("g"),
        fnv64(concat(lit("key_"), col("id"))).as("h"))
    // consume the aggregate VALUES: under a bare count() Catalyst prunes
    // the aggregate expressions away and nothing real is measured
    def runSketch(nKeys: Int): Metrics.TaskTotals =
      Metrics.measure(spark) {
        hashes(nKeys).groupBy("g")
          .agg(Sketches.kmvDistinct(col("h"), 256).as("kmv"),
            Sketches.hllDistinct(col("h"), 8).as("hll"))
          .agg(sum(col("kmv.estDistinct") + col("hll.estDistinct"))).head().getLong(0)
      }._2
    def runExact(nKeys: Int): Metrics.TaskTotals =
      Metrics.measure(spark) {
        hashes(nKeys).groupBy("g").agg(countDistinct(col("h")).as("cd"))
          .agg(sum("cd")).head().getLong(0)
      }._2
    val (s1, s8) = (runSketch(30000), runSketch(240000))
    val (e1, e8) = (runExact(30000), runExact(240000))
    assert(s8.shuffleWriteBytes < 2 * s1.shuffleWriteBytes + 4096,
      s"sketch shuffle must not track key cardinality: $s1 vs $s8")
    assert(e8.shuffleWriteBytes > 4 * e1.shuffleWriteBytes,
      s"sanity: exact countDistinct's shuffle should grow ~8x with keys: $e1 vs $e8")
    assert(s8.shuffleWriteBytes < e8.shuffleWriteBytes / 4,
      s"at 240k keys the sketch should shuffle far less than exact: $s8 vs $e8")
  }

  test("runtime contract: MisraGries per-row cost stays flat as width grows 100x") {
    import graft.operators.Sketches
    // all-distinct stream = worst case: every row is a new key, so the
    // map overflows continually. The amortized purge (trigger at
    // 2*width, one O(w log w) cut per w new keys) keeps per-row cost
    // ~O(log width); the old per-insert sort was O(width log width) per
    // row — width 100 -> 10000 meant ~100x per-row cost, where this
    // probe's bound is 10x (generous for JIT/alloc noise).
    // deterministic observable, not wall-clock (a loaded host or GC
    // pause must not flake this): amortization == the purge RUNS at most
    // once per `width` new keys, so its O(width log width) cost spreads
    // to O(log width) per row whatever the width
    def purges(width: Int, n: Int): Long = {
      val mg = new Sketches.MisraGries(width)
      val m = mg.zero
      var i = 0
      while (i < n) { mg.reduce(m, "item_" + i); i += 1 }
      mg.purgeCount
    }
    val narrow = purges(100, 1000000)
    val wide = purges(10000, 1000000)
    assert(narrow >= 1L && narrow <= 1000000L / 100 + 1,
      s"width 100: $narrow purges for 1M distinct inserts — expected <= n/width")
    assert(wide >= 1L && wide <= 1000000L / 10000 + 1,
      s"width 10000: $wide purges for 1M distinct inserts — expected <= n/width")
    // and the guarantee still holds at the wide width: a heavy item
    // survives the purges
    val mg = new Sketches.MisraGries(10000)
    val m = mg.zero
    (0 until 300000).foreach { i =>
      mg.reduce(m, "item_" + i)
      if (i % 3 == 0) mg.reduce(m, "hot")
    }
    assert(mg.finish(m).items.contains("hot"),
      "item above n/(width+1) must survive amortized purging")
  }
}
