package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audits: the properties that decide whether these plans
  * survive a 100x scale-up — broadcasts where a dim is small, filters and
  * projections reaching the parquet scan, rank-filter pushdown into the
  * window — asserted, not eyeballed.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  private def scansOf(name: String): Seq[FileSourceScanExec] = {
    val df = SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    root.collect { case s: FileSourceScanExec => s }
  }

  test("q03 star join broadcasts every small dimension") {
    val p = planOf("q03_star_revenue")
    assert(p.contains("BroadcastHashJoin"))
    // customer, nation, region are all broadcast -> exactly one shuffled join
    // (lineitem >< orders) may remain as sort-merge/shuffled-hash
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
  }

  test("q01 pushes the shipdate filter into the parquet scan") {
    val scans = scansOf("q01_pricing_summary")
    val li = scans.find(_.tableIdentifier.isEmpty).getOrElse(scans.head)
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate"), s"no pushed filter on l_shipdate in: $pushed")
  }

  test("q02 scans read only the referenced columns (pruning)") {
    val scans = scansOf("q02_top_customers")
    // orders has 9 columns; the query touches o_custkey + o_totalprice
    val ordersScan = scans.find(_.schema.fieldNames.exists(_.startsWith("o_"))).get
    assert(ordersScan.schema.fieldNames.toSet === Set("o_custkey", "o_totalprice"))
    val custScan = scans.find(_.schema.fieldNames.exists(_.startsWith("c_"))).get
    assert(custScan.schema.fieldNames.toSet === Set("c_custkey", "c_name"))
  }

  test("q08 latest-per-key pushes the rank limit into the window (WindowGroupLimit)") {
    val p = planOf("q08_latest_per_key")
    assert(p.contains("WindowGroupLimit"),
      "rn=1 filter should plan a per-group limit before the full sort")
  }

  test("q02 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = planOf("q02_top_customers")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q27 brute-force knn broadcasts the query side (no corpus shuffle)") {
    val p = planOf("q27_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q41 as-of join plans NO join operator at all (union + one window)") {
    val p = planOf("q41_asof_join")
    assert(!p.contains("Join"),
      s"asofBackward must be union+window, found a join in:\n$p")
    assert(p.contains("Window"), "expected the running last() window")
  }

  test("sketch reuse: q25 simhash plans at most one documents scan") {
    // sigs is referenced 4x (candidates + intra/inter expansion); the
    // in-operator persist must collapse those to ONE scan+sketch pass —
    // anything else is 3 redundant full-corpus scans at warehouse scale.
    val scans = scansOf("q25_simhash_pairs")
    assert(scans.size <= 1,
      s"expected <=1 parquet scan (persisted sigs), got ${scans.size}")
  }

  test("sketch reuse: q24 minhash plans at most one documents scan") {
    val scans = scansOf("q24_minhash_pairs")
    assert(scans.size <= 1,
      s"expected <=1 parquet scan (persisted sketches), got ${scans.size}")
  }

  test("sketch reuse: q40 embedding LSH plans at most one embeddings scan") {
    val scans = scansOf("q40_embedding_dedup_lsh")
    assert(scans.size <= 1,
      s"expected <=1 parquet scan (persisted (vec, sig) frame), got ${scans.size}")
  }

  test("q185 audio near-dup plans zero parquet re-scans (materialized sigs)") {
    // the (id, sig) frame is localCheckpoint-materialized once; the pair
    // machinery's four references must all read the checkpoint blocks,
    // never re-decode 50k WAV payloads per reference
    val scans = scansOf("q185_audio_neardup")
    assert(scans.isEmpty,
      s"expected 0 parquet scans (checkpointed sigs), got ${scans.size}")
  }

  test("q184 audio fingerprint is a pure projection: one sort exchange, pruned scan") {
    val p = planOf("q184_audio_fingerprint")
    // exactly the global-sort exchange — decode/fingerprint add no shuffle
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"fingerprinting must not shuffle, plan was:\n$p")
    // synth is keyed off doc_id alone: the scan must not read text
    val scans = scansOf("q184_audio_fingerprint")
    assert(scans.nonEmpty && scans.head.schema.fieldNames.toSeq === Seq("doc_id"),
      s"scan must read only doc_id, got ${scans.map(_.schema.fieldNames.toSeq)}")
  }

  test("q47 temperature-sample rates broadcast back to the corpus (filter in place)") {
    // the per-group thresholds are a |groups|-row frame; the corpus must
    // meet them via broadcast, never by shuffling itself on the group key
    val p = planOf("q47_temperature_sample")
    assert(p.contains("BroadcastHashJoin"),
      s"rates should broadcast-join the corpus, plan was:\n$p")
  }

  test("q42 range join is an equi-join on (key, bin), never a nested loop") {
    val p = planOf("q42_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bin bucketing must make the range join an equi-join, got:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"))
  }

  test("q81 token budget: ONE hash shuffle on the group key feeds the window") {
    // the cumulative-sum window and the admission filter share a single
    // hashpartitioning(lang) exchange; the only other exchange is the
    // final presentation sort
    val p = planOf("q81_token_budget_mix")
    val hashParts = "hashpartitioning\\(lang".r.findAllIn(p).size
    assert(hashParts === 1, s"expected one lang shuffle, got $hashParts in:\n$p")
  }

  test("q82 representatives: rank and member count share one cluster window") {
    // row_number and count(*) both partition by cluster_id — they must
    // plan into the same exchange, not two
    val p = planOf("q82_cluster_representatives")
    val hashParts = "hashpartitioning\\(cluster_id".r.findAllIn(p).size
    assert(hashParts === 1,
      s"expected one cluster_id shuffle for both window functions, got $hashParts in:\n$p")
  }

  test("q84 span dedup: no exchange ever carries document text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("q84_dup_spans")(spark, dir)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "span dedup must shuffle its hash triples")
    for (e <- exchanges; a <- e.output)
      assert(a.name != "text" && a.name != "__toks" && !a.dataType.typeName.contains("array"),
        s"exchange carries text-sized column '${a.name}: ${a.dataType}' — " +
          "only fixed-width (doc_id, pos, key) triples may shuffle")
  }

  test("q100/q102 state merges aggregate partially: map-side combine before the exchange") {
    // the whole point of mergeable state is that Spark combines partials
    // map-side and only state-sized rows cross the wire — both the KMV
    // udaf (ObjectHashAggregate) and the histogram counts (HashAggregate)
    // must plan a Partial stage under the exchange, not ship raw rows
    for ((q, agg) <- Seq(("q100_kmv_increments", "ObjectHashAggregate"),
                         ("q102_hist_increments", "HashAggregate"))) {
      val p = planOf(q)
      assert(p.contains(agg), s"$q should plan via $agg:\n$p")
      assert(p.contains("partial"),
        s"$q must have a partial (map-side) aggregation stage:\n$p")
    }
  }

  test("q93 set ops plan as semi/anti joins over distinct keys, no cartesian") {
    val p = planOf("q93_set_ops")
    assert(p.contains("LeftSemi"), s"INTERSECT should plan as a left-semi join:\n$p")
    assert(p.contains("LeftAnti"), s"EXCEPT should plan as a left-anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"set ops must never degrade to a product:\n$p")
    // the year filter must reach both scans, not evaluate post-join
    val pushed = scansOf("q93_set_ops").flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("o_orderdate"), s"o_orderdate filter not pushed: $pushed")
  }

  test("q94 unpivot expands map-side: no shuffle before the final sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("q94_unpivot")(spark, dir)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val shuffles = root.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size === 1,
      s"unpivot must be a projection-time expansion; only the ORDER BY may shuffle:\n$root")
    // only the 2 referenced metric columns + key are read from the 6-col table
    val scan = scansOf("q94_unpivot").head
    assert(scan.schema.fieldNames.toSet === Set("p_partkey", "p_size", "p_retailprice"),
      s"unpivot scan should prune to referenced columns, got ${scan.schema.fieldNames.toSeq}")
  }

  test("q107 join fan-out profile never joins the raw inputs (aggregates join, rows don't)") {
    val df = SparkEntry.queries("q107_join_fanout")(spark, dir)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    // every join input must sit above an aggregation — the profile's
    // whole point is pricing the join without producing its rows
    val joins = root.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      j.children.foreach { side =>
        val hasAgg = side.collectFirst {
          case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => h
          // the persisted per-key frame scans the CACHED aggregate, which
          // is equally "counts, not raw rows"
          case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
        }.isDefined
        val isTinyBroadcast = side.isInstanceOf[
          org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]
        assert(hasAgg || isTinyBroadcast,
          s"a join side reads raw rows — the profile must join COUNTS:\n$side")
      }
    }
  }

  test("q110/q111 score joins broadcast the count/vocab side (corpus-scale side never shuffles for the join)") {
    for (q <- Seq("q110_bigram_surprise", "q111_oov_rate")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q must join its (bounded) count table broadcast:\n$p")
    }
  }

  test("q118 join-size estimate: one-row CMS states broadcast, partial-aggregated") {
    val p = planOf("q118_cms_join_size")
    // the two state frames cross in as broadcasts of ONE row each
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      s"both CMS states must arrive broadcast, never shuffled:\n$p")
    // the udaf combines map-side: state-sized rows cross the wire, not events
    assert(p.contains("ObjectHashAggregate") && p.contains("partial"),
      s"CMS build must partial-aggregate map-side:\n$p")
  }

  test("q119 sample state: every top-k plans TakeOrderedAndProject, never a global sort") {
    val p = planOf("q119_sample_state")
    assert(p.contains("TakeOrderedAndProject"),
      s"min-k by hash must plan per-partition top-k:\n$p")
  }

  test("q121 centrality / q120 incremental clusters: edges persist, no product joins") {
    for (q <- Seq("q121_dup_centrality", "q120_cluster_increments")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must never degrade to a product join:\n$p")
    }
  }

  test("q122 range plan: assignment is a narrow fold (no join), scan prunes to the value column") {
    val df = SparkEntry.queries("q122_range_plan")(spark, dir)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val joins = root.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      s"boundaries are literals by the time the query plans — no join belongs here:\n$root")
    val scan = scansOf("q122_range_plan").head
    assert(scan.schema.fieldNames.toSet === Set("n_chars"),
      s"assignment should prune the scan to the value column, got ${scan.schema.fieldNames.toSeq}")
  }

  test("q127 stratified sample state: rank limit pushes into the window (WindowGroupLimit)") {
    val p = planOf("q127_group_sample_state")
    assert(p.contains("WindowGroupLimit"),
      s"per-group min-k must plan a group limit, not a full window sort:\n$p")
  }

  test("q172 weighted quota: rank limit pushes into the window (WindowGroupLimit)") {
    val p = planOf("q172_weighted_quota")
    assert(p.contains("WindowGroupLimit"),
      s"per-group weighted top-k must plan a group limit:\n$p")
  }

  test("q124 centroid drift: dim sums partial-aggregate under the exchange") {
    val p = planOf("q124_centroid_drift")
    assert(p.contains("partial"),
      s"per-(group, dim) integer sums must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"drift is aggregation-shaped — no product joins:\n$p")
  }

  test("q143 quality gate: weight joins broadcast — the scored corpus never shuffles for a join") {
    val p = planOf("q143_quality_gate")
    assert(p.contains("BroadcastHashJoin"),
      s"the (<= buckets)-row weight frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no classifier join may shuffle the corpus side:\n$p")
  }

  test("q144 semantic dedup: centroid lookup broadcasts; the pair join is cell-keyed, never a product") {
    val p = planOf("q144_semantic_dedup")
    assert(p.contains("BroadcastHashJoin"),
      s"the nCells-row centroid frame must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the cell equi-join, never all-pairs:\n$p")
  }

  test("q158 bucketed join: zero hash exchange — the write-time shuffle co-locates both sides") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    // forbid broadcast so the join actually exercises the bucket layout
    // (at fixture scale the aggregates would broadcast and the bucket
    // claim would never plan)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q158_bucketed_join")(spark, dir)
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val shuffles = root.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.forall(_.outputPartitioning.getClass.getSimpleName
          .contains("RangePartitioning")),
        s"only the final ORDER BY may exchange; the join must read bucket " +
          s"co-location from the catalog:\n$root")
      // non-vacuous counterfactual: the identical join over un-bucketed
      // frames hash-shuffles
      val ev = Tables.events(spark, dir)
      def perUser(t: String, out: String) =
        ev.filter(col("event_type") === t)
          .groupBy("user_id").agg(count(lit(1)).as(out))
      val plain = perUser("view", "n_views")
        .join(perUser("click", "n_clicks"), "user_id")
      val proot = plain.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val hashShuffles = proot.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.getClass.getSimpleName
          .contains("HashPartitioning"))
      assert(hashShuffles.nonEmpty,
        "counterfactual lost its shuffle — the bucket pin proves nothing")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact scan at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the 100 TB star-join property: the fact table is partitioned on the
    // dim key, the dim filter is only known at runtime, and DPP turns it
    // into a partition filter on the fact scan — without it the fact
    // scan reads all partitions and the filter runs post-join
    val dppDir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.range(10000)
      .select(col("id"), pmod(col("id"), lit(20)).as("rk"), (col("id") * 3).as("v"))
      .write.mode("overwrite").partitionBy("rk").parquet(s"$dppDir/fact")
    // partition columns read back as INT (directory-name inference); the
    // dim key must match exactly — a cast on the partition column defeats
    // DPP — and the dim must be a FILE scan: a local relation never
    // qualifies as the filtering side (both near-misses are what this
    // pin guards)
    (0 until 20).map(k => (k, if (k < 2) "keep" else "drop"))
      .toDF("rk", "tag")
      .write.mode("overwrite").parquet(s"$dppDir/dim")
    val dim = spark.read.parquet(s"$dppDir/dim")
    val fact = spark.read.parquet(s"$dppDir/fact")
    // at fixture sizes the stats-based benefit estimate declines (a KB
    // fact scan has nothing to save); force the fallback ratio so the
    // pin exercises the 100 TB-shaped decision
    val saved = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val q = fact.join(dim.filter(col("tag") === "keep"), "rk")
        .groupBy("rk").agg(sum("v").as("sv"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a DPP partition filter on the fact scan:\n$plan")
      assert(q.count() === 2L, "only the two kept partitions survive")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", saved)
  }

  test("q174 serving encode joins the folded vocab by broadcast, no sort-merge") {
    // the r9 rewrite runs the merge fold at distinct-word cardinality;
    // this pins the plan consequence: the folded vocabulary is the SMALL
    // side of a broadcast join (corpus tokens never sort-merge on word),
    // and the fold itself appears once, not per occurrence
    val p = planOf("q174_bpe_encode_serving")
    assert(p.contains("BroadcastHashJoin"),
      s"folded vocab should broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-side sort-merge join expected:\n${p.take(2000)}")
  }

  test("q175 end-to-end chain: no cartesian product; one-row frames broadcast; dedups rank-pushed") {
    val p = planOf("q175_airbnb_e2e")
    assert(!p.contains("CartesianProduct"),
      "the only cross joins allowed are broadcast one-row/state frames")
    // watermark scalar, max-custkey scalar, station grid: all broadcast
    assert(p.contains("BroadcastNestedLoopJoin"))
    // every latest-per-key merge (listings x2, hosts, reviews x2) must
    // push its rank filter into the window
    assert("WindowGroupLimit".r.findAllIn(p).size >= 5,
      "latest-per-key dedups should plan WindowGroupLimit")
  }

  test("q181 aHash: one documents scan pruned to doc_id, hashed inside codegen") {
    val scans = scansOf("q181_image_ahash")
    assert(scans.size === 1, "synth+decode+hash is a single-pass projection")
    // the payload is synthesized FROM doc_id — the scan must not read text
    assert(scans.head.schema.fieldNames.toSet === Set("doc_id"),
      s"scan reads ${scans.head.schema.fieldNames.mkString(",")}")
    // codegen explain actually GENERATES the code — a CodegenFallback
    // expression in the hash path would break the span
    val cg = SparkEntry.queries("q181_image_ahash")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"), cg.take(500))
  }

  test("q182 image near-dup: equi candidate joins only, sigs materialized once") {
    val df = SparkEntry.queries("q182_image_neardup")(spark, dir)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val plan = root.toString
    // candidates join on (combo, v1, v2); intra/inter expansions join on
    // sig — a product join here is the all-pairs plan this operator exists
    // to avoid
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"image near-dup must never degrade to a product join:\n$plan")
    // the (id, sig) frame is localCheckpoint-materialized in the query
    // body; every one of its three consumers must read that RDD, never
    // re-scan parquet (re-running synth+decode+hash per consumer)
    assert(root.collect {
      case s: FileSourceScanExec => s
    }.isEmpty, s"plan re-scans files instead of the materialized sigs:\n$plan")
  }

  test("q190 contamination closure: verdict joins broadcast, corpus never products") {
    val p = planOf("q190_contamination_closure")
    // the direct-flag and bad-cluster sides are benchmark-sized by
    // construction and explicitly hinted — the per-doc verdict must ride
    // broadcast joins, never shuffle the corpus against them
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"flag/cluster joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no product joins:\n$p")
  }

  test("q192 wordpiece encode: vocab broadcast, greedy walk is a projection (no per-step join)") {
    val p = planOf("q192_wordpiece_encode")
    // the vocabulary is a bounded model artifact — candidate matching
    // joins it broadcast; the greedy cursor walk itself is a zero-join
    // fold over the per-word match map
    assert(p.contains("BroadcastHashJoin"),
      s"vocab match join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"no product joins in the encode path:\n$p")
  }

  test("q195 unigram encode: segmentation joins hash-wise, scans prune to id+text") {
    // the fit runs eagerly at construction; the returned ENCODE plan is
    // live — Viterbi is a per-distinct-word projection (broadcast score
    // map inside the udf, no join per DP step), so the only joins are
    // the token-to-segment equi-joins
    val p = planOf("q195_unigram_encode")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"no product joins in the encode path:\n$p")
    val scans = scansOf("q195_unigram_encode")
    assert(scans.nonEmpty && scans.forall(s =>
      s.schema.fieldNames.toSet.subsetOf(Set("doc_id", "text"))),
      s"scans must prune to id+text: ${scans.map(_.schema.fieldNames.mkString(","))}")
  }
}
