package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, q) => (s, o, Some(q.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // the engine's intended session config (AQE + skew join + broadcast
    // threshold + extensions), not an ad-hoc builder
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional 3rd arg (local dev only; the driver passes 2): run just the
    // named queries — oracle_sql.json still covers them for check_oracle.
    // The special name "@oracle_only" runs NO queries but dumps the FULL
    // oracle map — a manual/local shortcut for iterating on oracle SQL
    // (e.g. timing a new oracle in DuckDB) without paying for the Spark
    // dump. gate_sf01.py does NOT use it: its DuckDB phase needs the
    // Spark parquet to compare against, so a timing pre-pass would run
    // every oracle twice for no net saving.
    val oracleOnly = only.exists(_.contains("@oracle_only"))
    SparkEntry.queries
      .filter { case (name, _) => !oracleOnly && only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // queries that return localCheckpoint-backed frames (exact pair
        // audits, materialized signature frames) leave blocks in executor
        // storage that unpersist/clearCache never touch — release them
        // once the result is on disk, or a 183-query run accumulates one
        // materialized frame per such query in this long-lived session
        CheckpointBlocks.release(df)
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => oracleOnly || only.forall(_.contains(k)) }
      .map { case (k, v) => s"${JsonText.quote(k)}: ${JsonText.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // declared gate-scope restrictions (r13 ADVICE): the reduced-coverage
    // caps (q38's doc-id block, q187's replica cap) must be readable from
    // the CORRECTNESS artifacts, so check_oracle attaches these per query
    val scopes = SparkEntry.queryScopes
      .filter { case (k, _) => oracleOnly || only.forall(_.contains(k)) }
      .map { case (k, v) => s"${JsonText.quote(k)}: ${JsonText.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/scopes.json"), scopes)
    spark.stop()
  }
}
