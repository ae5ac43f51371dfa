package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in [[RelationalQueries]] (SURVEY.md §2 operator inventory
  * on the TPC-H-ish fixtures) and [[TrainingDataQueries]] (dedup /
  * similarity / text-analysis / multimodal scope).
  */
object SparkEntry {

  val defs: Seq[QDef] = RelationalQueries.all ++ TrainingDataQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Declared gate-scope restrictions (deliberate sub-corpus caps whose
    * reduced coverage must surface in the CORRECTNESS artifacts). */
  def queryScopes: Map[String, String] =
    defs.flatMap(d => d.scope.map(d.name -> _)).toMap
}
