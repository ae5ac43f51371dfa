package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    // Gate-scope note (r13 ADVICE): when a query and its oracle are
    // deliberately restricted to a sub-corpus at scale (a blocked doc-id
    // range, a replica cap), the restriction must be readable from the
    // CORRECTNESS artifacts themselves, not only from code comments —
    // Verify dumps these as scopes.json and check_oracle attaches them
    // per query, so a reader of the JSON sees the reduced coverage.
    scope: Option[String] = None)
