package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
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
    // optional regex filter for profiling a subset, e.g. SPARK_GRAFT_ONLY=q24.*
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(n.matches) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (a bare count() would
      // let Catalyst prune projections and skip the actual work)
      val err: Option[String] =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: $e")
          Some(e.toString.take(200))
        }
      name -> ((System.nanoTime() - t0) / 1e9, err)
    }
    // a failing query must not masquerade as a fast success: report -1 and
    // the error, and count failures in the summary line (full JSON string
    // escaping — an unescaped control char in an exception message would
    // make the whole summary line unparseable)
    val qs = results.map {
      case (k, (v, None)) => s"\"" + k + "\":" + v
      case (k, (_, Some(e))) => s"\"" + k + "\":{\"sec\":-1,\"err\":" + JsonText.quote(e) + "}"
    }.mkString("{", ",", "}")
    val failed = results.count(_._2._2.isDefined)
    val total = results.collect { case (_, (v, None)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    if (failed > 0) System.err.println(s"$failed queries FAILED")
    spark.stop()
  }
}
