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
      // (spark.sql.adaptive.coalescePartitions.parallelismFirst stays at
      // its default TRUE: an A/B panel of the 12 heaviest maintenance
      // queries showed `false` serializing CPU-dense small-byte stages —
      // q219's levenshtein blocking join regressed 7.7→9.1 s — and the
      // driver's low-core scaling run would lose its parallelism signal.)
      // DeltaStore/MorTable reads enumerate each live gbucket dir as an
      // explicit scan path; past 32 paths Spark launches a distributed
      // LISTING JOB per read (measured in the q224 profile: 20-48-task
      // listing jobs inside every maintenance fold). The store's dirs
      // each hold ~1 file, and driver-side listing of a local/HDFS-style
      // FS is microseconds per dir — raise the parallel-listing cutoff
      // so metadata stays a driver step, as every manifest-based table
      // format does. (An object-store deployment with thousands of live
      // prefixes per read would lower it again — that is what the knob
      // is for.)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      // Plan-description strings are generated for EVERY execution and
      // re-generated on every AQE stage update (SparkListenerSQL*
      // events fire with spark.ui.enabled=false too). Gap-profiling the
      // maintenance folds showed generateTreeString / StringConcat /
      // SparkPlanInfo high in the no-job-running driver samples — pure
      // observability metadata for plans with hundreds of operators.
      // Cap the string length: diagnostics keep the plan HEAD, the
      // driver stops burning time rendering megabyte plan tails.
      .config("spark.sql.maxPlanStringLength", "8192")
      // events.parquet carries INT64 TIMESTAMP(NANOS) — see Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the maxPlanStringLength cap above fires routinely by design; the
    // per-truncation WARN would spam every bench/verify log
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.util.StringUtils",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
    spark
  }
}
