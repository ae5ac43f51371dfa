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
    // query doesn't absorb session startup costs
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    // optional regex filter for profiling a subset, e.g. SPARK_GRAFT_ONLY=q24.*
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(n.matches) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (a bare count() would
      // let Catalyst prune projections and skip the actual work)
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
