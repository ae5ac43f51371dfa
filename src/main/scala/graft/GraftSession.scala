package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-minded defaults.
  *
  * Local testing runs `local[32]`; the same conf block is what we would ship
  * as `spark-defaults` on a real cluster (AQE on, skew-join handling on,
  * sane shuffle partition count). Mirrors the intent of the reference's
  * hand-tuned `config/spark-config.json:12-27` but delegates runtime
  * re-planning to AQE instead of a fixed `default.parallelism`.
  */
object GraftSession {

  def builder(master: String = "local[32]", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // SQL-surface registration of the native expressions (lang_id,
      // sentiment, word_shingles, simhash64, minhash_buckets, fake_decode)
      .withExtensions(new GraftExtensions)
      // Local mode: one shuffle partition per core. On a 1000-executor
      // cluster this would be set to ~2-3x total cores; AQE coalesces
      // small partitions back down at runtime either way.
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet ships TIMESTAMP(NANOS); read as long, see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Local-mode heartbeat hardening (r13): the driver and the
      // "executor" are the SAME JVM here, so the heartbeat carries no
      // liveness information — but a >120 s stop-the-world pause (or a
      // host-level virtualization stall; one killed an sf1 bench session
      // mid-suite: "Removing executor driver with no recent heartbeats:
      // 128509 ms") makes HeartbeatReceiver remove the executor and tear
      // the whole context down. On a real cluster these would stay at
      // defaults; in local mode a generous timeout only trades a
      // meaningless failure mode away.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      // keep the default INT96 parquet timestamp output: TIMESTAMP_MICROS
      // sets isAdjustedToUTC and external readers (the DuckDB oracle) then
      // see tz-aware values where their own computed timestamps are naive

  def getOrCreate(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
