package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // contention preflight (r10 lesson: three of seven round-10 runs were
    // silently contaminated by co-tenant JVMs — an orphaned Scratch JVM
    // burned ~466 CPU-minutes under two benches). Measured BEFORE the
    // session starts: any OTHER java process (self + ancestors excluded,
    // so an sbt wrapper doesn't self-flag) or a high 1-min load average
    // marks the whole artifact `host_busy` — a later reader adjudicates
    // the run from the artifact instead of from memory.
    val selfChain = Iterator.iterate(Option(ProcessHandle.current())) {
      _.flatMap(h => Option(h.parent().orElse(null)))
    }.takeWhile(_.isDefined).take(32).flatten.map(_.pid()).toSet
    val foreignJvms =
      try ProcessHandle.allProcesses().filter(p =>
          !selfChain.contains(p.pid()) &&
            p.info().command().map[Boolean](_.contains("java")).orElse(false))
        .count()
      catch { case _: Throwable => -1L }
    def loadNow(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // r11 lesson: a 2.21 preflight load slipped past the old
    // 0.5×cpus(=16) threshold and the capture came back 40% inflated.
    // New contract: load_avg > 1.0 is contention-suspect. Rather than
    // refuse outright (the driver's capture would then be EMPTY — worse
    // than labeled), wait up to ~2 min for the host to go idle, then
    // stamp whatever the final reading is; hostBusy relabels the artifact.
    var loadAvg = loadNow()
    var waited = 0
    while (loadAvg > 1.0 && waited < 120) {
      System.err.println(f"BENCH preflight: load_avg=$loadAvg%.2f > 1.0 — waiting for idle ($waited s)")
      Thread.sleep(5000); waited += 5; loadAvg = loadNow()
    }
    // hypervisor CPU steal PRE-flight (r13 VERDICT #3): load_avg and
    // foreign-JVM checks cannot see a neighbor VM stealing the physical
    // cores, so BENCH_r13 started (and shipped) at 5.51% steal. Sample
    // /proc/stat col 8 over a ~10 s window BEFORE the session starts;
    // above 2% wait for the neighbor burst to pass (same
    // wait-then-relabel contract as the load gate — refusing outright
    // would hand the driver an EMPTY capture), then stamp the final
    // reading and fold it into host_busy.
    def cpuTicks(): (Long, Long) =
      try {
        val f = java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/stat"))
          .get(0).trim.split("\\s+")
        val vals = f.drop(1).map(_.toLong)
        (vals.sum, if (vals.length > 7) vals(7) else 0L)
      } catch { case _: Throwable => (-1L, -1L) }
    def stealWindowPct(windowMs: Long): Double = {
      val a = cpuTicks(); Thread.sleep(windowMs); val b = cpuTicks()
      if (a._1 < 0 || b._1 <= a._1) -1.0
      else math.round(10000.0 * (b._2 - a._2) / (b._1 - a._1)) / 100.0
    }
    var stealPre = stealWindowPct(10000)
    var stealWaited = 0
    while (stealPre > 2.0 && stealWaited < 120) {
      System.err.println(f"BENCH preflight: steal=$stealPre%.2f%% > 2%% — waiting for neighbor burst to pass ($stealWaited s)")
      stealWaited += 10
      stealPre = stealWindowPct(10000)
    }
    val hostBusy = foreignJvms > 0 || loadAvg > 1.0 || stealPre > 2.0
    if (hostBusy) System.err.println(
      s"BENCH WARN: host busy at start (foreign JVMs=$foreignJvms, load=$loadAvg, steal=$stealPre%) — " +
        "timings in this artifact are contention-suspect")
    // I/O pressure (r12 VERDICT #3): load_avg cannot see host-I/O
    // neighbor noise, which is the standing suspect for the sf1
    // heavy-tail swings (q101 13 -> 91 s on identical binaries). Stamp
    // the PSI "some avg10" for io at start AND end so a later reader can
    // adjudicate a swung run from the artifact. -1.0 = PSI unavailable.
    def ioPsi(): Double =
      try {
        val line = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/pressure/io")).get(0)
        "avg10=([0-9.]+)".r.findFirstMatchIn(line).map(_.group(1).toDouble).getOrElse(-1.0)
      } catch { case _: Throwable => -1.0 }
    val ioPsiStart = ioPsi()
    // run-wide hypervisor steal (r13): the artifact ALSO carries the
    // whole-run steal share (start→end tick delta) so a swung capture
    // is adjudicable from disk even when the burst arrived mid-run.
    val ticksStart = cpuTicks()
    // the engine's intended session config (AQE + skew join + broadcast
    // threshold + extensions), not an ad-hoc builder
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT and parquet footer caches so the first timed
    // query doesn't absorb session startup costs. Best-effort: a broken
    // SF dir must surface as per-query failure entries in the JSON below,
    // not kill the run before any report is written.
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    catch { case e: Throwable => System.err.println(s"BENCH warm-up skipped: $e") }
    // fixed page-cache protocol (r12 VERDICT #3): stream-read every
    // parquet byte of the SF dir before the first timed query. Hours of
    // interim work between ScaleData and the bench used to evict the
    // page cache and inflate scan-bound queries ~5x (q94 0.5 -> 4.7 s
    // cold) — an effect neither load_avg nor foreign-JVM preflight can
    // see. Untimed, sequential, correctness-neutral; opt out with
    // SPARK_GRAFT_WARM_SCAN=false.
    if (!sys.env.get("SPARK_GRAFT_WARM_SCAN").contains("false")) {
      val t0 = System.nanoTime()
      var bytes = 0L
      try {
        val buf = new Array[Byte](1 << 20)
        java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir)).forEach { p =>
          if (p.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p)) {
            val in = java.nio.file.Files.newInputStream(p)
            try { var n = 0; while ({ n = in.read(buf); n >= 0 }) bytes += n }
            finally in.close()
          }
        }
        System.err.println(f"BENCH warm scan: ${bytes / 1e9}%.2f GB in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable => System.err.println(s"BENCH warm scan skipped: $e") }
    }
    // optional regex filter for profiling a subset, e.g. SPARK_GRAFT_ONLY=q24.*
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    // LABELED stress demonstrations (recall-stress twins that are
    // GC-bait by design — q187 verifies 4.6M pairs at sf1 and was 36%
    // of the r11 sf1 suite wall). They run LAST so their memory churn
    // cannot elevate engine queries, and the summary carries
    // `value_ex_stress` so the scale curve stands alone without them.
    val stressQueries = Set("q187_embedding_lsh_recall_stress")
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(n.matches) }
      .sortBy { case (n, _) => (stressQueries.contains(n), n) }
    // median-of-3 per query: a single cold iteration makes the reported
    // number hostage to transient machine load (GC pause, page-cache miss,
    // a co-tenant burst), and the round-8 artifact proved a whole RUN can
    // be contention-contaminated (uniform ~1.5x inflation across unrelated
    // plans on an overlapping-JVM host). The median rejects one bad
    // attempt per query; every attempt is also recorded in the JSON so a
    // contaminated run is DIAGNOSABLE from the artifact, not from memory.
    val iterations = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(3)
    // sf1 methodology pin (r12 VERDICT #3): the ~10 heavy-tail queries
    // swing 1.5-4x between identical-binary sf1 runs, so single-shot
    // ITERS=1 medians are not comparable round over round. A separate
    // iteration count for the heavy tail gives median-of-3 where it
    // matters without tripling the whole sf1 session.
    val heavyRegex = sys.env.getOrElse("SPARK_GRAFT_HEAVY_REGEX",
      "q49.*|q101.*|q103.*|q182.*|q185.*|q189.*")
    val heavyIters = sys.env.get("SPARK_GRAFT_HEAVY_ITERS").map(_.toInt)
    // GC cadence: per QUERY by default, per attempt via env. A per-attempt
    // full GC was MEASURED (r12) to inflate state-heavy queries 2-3x
    // PERSISTENTLY across all attempts (q101 2.26 -> 5.9 s, q103 2.38 ->
    // 6.9, q139 4.5 -> 6.1 on an idle host): each GC enqueues the prior
    // attempt's weak refs and the ContextCleaner then drains them — block
    // manager RPCs, lock contention, generated-class unloading — DURING
    // the next timed section. The r11 within-query growth the per-attempt
    // cadence was meant to fix ([6.5, 20.3, 28.3] on q101) appeared only
    // in the load-2.21 contaminated capture; clean r11 runs showed no
    // growth under per-query GC, and the stricter preflight above now
    // refuses-or-relabels such hosts.
    val gcPerAttempt = sys.env.get("SPARK_GRAFT_GC_PER_ATTEMPT").exists(_.toBoolean)
    val results = selected.map { case (name, fn) =>
      // Left carries (message, isDesignedRefusal): a ScaleRefusal is a
      // size-bounded audit instrument declining oversized input —
      // promised behavior, recorded under `designed_skips` instead of
      // `failed` (r13 VERDICT #4) so `failed > 0` always means breakage.
      def attempt(): Either[(String, Boolean), Double] = {
        // Operators that persist shared sketch frames (NearDedup.reused)
        // leave entries in the cache manager, which dedups by canonicalized
        // plan: without this, iteration 2 of a dedup query reads the warm
        // cache (min-of-2 would report a warm-cache time) and entries
        // accumulate across all queries, skewing later ones via memory
        // pressure. Clear so every attempt pays the real scan+sketch cost.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // noop sink: materializes every output column (a bare count() would
        // let Catalyst prune projections and skip the actual work)
        try {
          val df = fn(spark, sfDir)
          df.write.mode("overwrite").format("noop").save()
          val sec = (System.nanoTime() - t0) / 1e9
          // free localCheckpoint blocks the query materialized: clearCache
          // above never touches them (they live on the checkpointed RDD,
          // not in the cache manager), so 183 queries x 3 attempts would
          // otherwise accumulate every audit frame for the whole run
          CheckpointBlocks.release(df)
          Right(sec)
        }
        catch {
          case e: ScaleRefusal =>
            System.err.println(s"BENCH designed refusal $name: $e")
            Left((e.toString.take(200), true))
          case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: $e")
            Left((e.toString.take(200), false))
        }
        finally {
          // untimed, between ATTEMPTS: Spark's ContextCleaner is weak-ref
          // driven and only reclaims dropped broadcasts/cached/checkpoint
          // blocks after a DRIVER GC — on a large heap a ~200-query
          // session may never GC, so blocks accumulate and later work runs
          // under growing memory pressure. The r11 per-QUERY GC fixed the
          // suite-position elevation (q187 400 s → 170.6 s class) but not
          // the per-ATTEMPT case: state-heavy queries late in the session
          // grew monotonically across their own 3 attempts (q101 ran
          // [6.5, 20.3, 28.3] s against a 1.7 s clean value) because the
          // blocks released above were only reclaimed after the NEXT
          // query's GC. One GC per attempt keeps the cleaner current; it
          // runs AFTER the timed section.
          if (gcPerAttempt) System.gc()
        }
      }
      val baseIters =
        if (heavyIters.isDefined && name.matches(heavyRegex)) heavyIters.get
        else iterations
      // a designed refusal is deterministic (the guard counts the input),
      // so repeating it only re-pays the guard's count() — one attempt
      // settles it
      var attempts: Seq[Either[(String, Boolean), Double]] = Seq(attempt())
      if (!attempts.head.left.exists(_._2))
        attempts = attempts ++ (2 to baseIters).map(_ => attempt())
      // auto-retry (r12 VERDICT #6): a committed artifact should not carry
      // a median inflated by one contended attempt when two more attempts
      // would show it. If the successes spread more than the threshold
      // (med/min > 1.3 above 2 s — r13's q121 slipped under 1.5 at 1.45 —
      // and 1.5 in the sub-2 s scheduler-noise class, where ~6x spreads
      // are documented noise and a 1.3 trigger would retry half the
      // suite), take up to 2 extra attempts and re-median over everything
      // — the extra attempts are recorded in `runs` like any other, so
      // the retry is visible in the artifact, never hidden.
      def spreadBad(a: Seq[Either[(String, Boolean), Double]]): Boolean = {
        val ok = a.collect { case Right(s) => s }
        if (ok.size < 2) false
        else {
          // at exactly 2 successes the lower-middle median equals the min
          // and no spread could ever trigger — compare max/min instead
          val med = if (ok.size == 2) ok.max else ok.sorted.apply((ok.size - 1) / 2)
          med > (if (med > 2.0) 1.3 else 1.5) * ok.min
        }
      }
      var extraRetries = 0
      while (extraRetries < 2 && spreadBad(attempts)) {
        System.err.println(s"BENCH retry $name: median/min > 1.5 — extra attempt")
        attempts = attempts :+ attempt()
        extraRetries += 1
      }
      if (!gcPerAttempt) System.gc()
      // optional settle window after the untimed GC: the ContextCleaner
      // drains the enqueued refs ASYNCHRONOUSLY (block-manager RPCs), and
      // at sf1 state volumes that drain otherwise lands inside the NEXT
      // query's timed section (see the gcPerAttempt note above)
      sys.env.get("SPARK_GRAFT_GC_SETTLE_MS").map(_.toLong).filter(_ > 0)
        .foreach(Thread.sleep)
      val ok = attempts.collect { case Right(s) => s }
      val nErr = attempts.count(_.isLeft)
      val err: Option[String] =
        if (ok.nonEmpty) None else attempts.collectFirst { case Left((e, _)) => e }
      // pure-refusal query: every attempt was the loud guard declining —
      // designed behavior at this SF, not breakage
      val refusal = ok.isEmpty && attempts.nonEmpty &&
        attempts.forall { case Left((_, d)) => d; case _ => false }
      // lower-middle median: robust to one slow attempt at n=3, and
      // degrades to min at n=2 (the pre-r9 behavior) and the value at n=1
      val med = if (ok.isEmpty) -1.0 else ok.sorted.apply((ok.size - 1) / 2)
      name -> (med, ok, err, nErr, refusal)
    }
    // a failing query must not masquerade as a fast success: report -1 and
    // the error, and count failures in the summary line (full JSON string
    // escaping — an unescaped control char in an exception message would
    // make the whole summary line unparseable)
    val qs = results.map {
      case (k, (v, _, None, _, _)) => s"\"" + k + "\":" + v
      case (k, (_, _, Some(e), _, refusal)) =>
        s"\"" + k + "\":{\"sec\":-1," +
          (if (refusal) "\"designed_skip\":true," else "") +
          "\"err\":" + JsonText.quote(e) + "}"
    }.mkString("{", ",", "}")
    // per-attempt record (successes only): lets a later reader separate
    // "this query regressed" from "that run was contaminated" — uniform
    // cross-attempt spread is contention, a per-query shift is real
    val runs = results.map { case (k, (_, ok, _, _, _)) =>
      s"\"" + k + "\":" + ok.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // a query failing on SOME attempts still medians its successes, so
    // intermittent flakiness would otherwise vanish from the artifact —
    // record per-query failed-attempt counts and surface them as `flaky`
    val errsMap = results.filter(_._2._4 > 0).map { case (k, (_, _, _, n, _)) =>
      s"\"" + k + "\":" + n
    }.mkString("{", ",", "}")
    // designed_skips carry the loud-guard refusals (the 3 expected sf1
    // exact-audit declines); `failed` counts only real breakage
    val designedSkips = results.collect { case (k, (_, _, Some(_), _, true)) => k }
    val failed = results.count { case (_, (_, _, e, _, refusal)) => e.isDefined && !refusal }
    val flaky = results.count { case (_, (_, ok, _, n, _)) => n > 0 && ok.nonEmpty }
    val total = results.collect { case (_, (v, _, None, _, _)) => v }.sum
    // the scale curve without the labeled stress demonstrations — the
    // engine number a reader should quote; `value` keeps everything
    // intersect with what actually RAN: under SPARK_GRAFT_ONLY a subset
    // artifact must not claim a stress set that never executed (and when
    // nothing stressful ran, value_ex_stress == value by construction —
    // the duplication is the honest statement that nothing was excluded)
    val ranStress = stressQueries.intersect(results.map(_._1).toSet)
    val totalExStress = results
      .collect { case (k, (v, _, None, _, _)) if !ranStress.contains(k) => v }.sum
    val stressJson = ranStress.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val designedSkipsJson = designedSkips.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // key order matters downstream: a `cmd | tail` capture keeps the END
    // of this line, so the per-attempt `runs` detail goes FIRST and the
    // headline medians (`queries`) + totals go LAST, where truncation
    // cannot eat them
    val line = s"""{"metric":"total","unit":"sec","iterations":$iterations,"runs":$runs,"errs":$errsMap,"queries":$qs,"sf":"$sfDir","failed":$failed,"flaky":$flaky,"host_busy":$hostBusy,"foreign_jvms":$foreignJvms,"load_avg":$loadAvg,"io_psi_start":$ioPsiStart,"io_psi_end":${ioPsi()},"designed_skips":$designedSkipsJson,"steal_preflight_pct":$stealPre,"steal_pct":${
      val e = cpuTicks()
      if (ticksStart._1 < 0 || e._1 <= ticksStart._1) -1.0
      else math.round(10000.0 * (e._2 - ticksStart._2) / (e._1 - ticksStart._1)) / 100.0
    },"stress":$stressJson,"value_ex_stress":$totalExStress,"value":$total}"""
    println(line)
    // tail-capture insurance: the summary line grows with the query count
    // and a `cmd | tail` capture can truncate its head, losing early
    // entries — the full JSON is also durably on disk. BENCH_FULL is
    // "latest"; the timestamped bench_runs/ copy is append-only history,
    // so a contaminated driver run can never again OVERWRITE the only
    // record of a clean one (the r9 lesson: the clean 161 s medians
    // survived only as prose after the driver run clobbered BENCH_FULL).
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
      val runsDir = java.nio.file.Paths.get("bench_runs")
      java.nio.file.Files.createDirectories(runsDir)
      val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
      // CREATE_NEW, never truncate: append-only means a same-second
      // concurrent run (or a retried wrapper) must land NEXT TO the
      // existing record, not over it — suffix until a fresh name wins
      val target = Iterator.from(0)
        .map(i => runsDir.resolve(if (i == 0) s"$stamp.json" else s"$stamp-$i.json"))
        .find(p => !java.nio.file.Files.exists(p)).get
      java.nio.file.Files.writeString(target, line + "\n",
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }
    catch { case e: Throwable => System.err.println(s"bench artifact write failed: $e") }
    if (failed > 0) System.err.println(s"$failed queries FAILED")
    if (designedSkips.nonEmpty) System.err.println(
      s"${designedSkips.size} designed refusals (loud scale guards): ${designedSkips.sorted.mkString(", ")}")
    if (flaky > 0) System.err.println(s"$flaky queries flaky (succeeded after failed attempts)")
    spark.stop()
  }
}
