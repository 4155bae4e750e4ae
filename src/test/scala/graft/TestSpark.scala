package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark session startup costs
  * ~10 s; suites reuse it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("local[4]", "4")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
