package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify, Bench, and tests agree.
  *
  * Scale notes: shuffle partitions default to the local core count (the
  * driver runs local[32]); on a real cluster this would be set to
  * executors*cores*2-3 or left to AQE coalescing, which is enabled here
  * and does the right thing in both worlds.
  */
object Sessions {

  def builder(master: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // the engine's Catalyst surface (custom expressions + optimizer
      // rules) is part of every session, exactly as a deployed cluster
      // would set spark.sql.extensions
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries INT64 TIMESTAMP(NANOS) — see Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
