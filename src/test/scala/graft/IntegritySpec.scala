package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The q196 gate runs over CLEAN testdata (n_orphan_keys = 0 on every
  * relationship — itself the integrity assertion), so detection of
  * actual violations needs injected corpora. */
class IntegritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fkAudit counts orphan keys, orphan rows, and childless parents") {
    import spark.implicits._
    // parents 1..4; children reference 2,2,3,7,7,7,9 → orphan keys
    // {7,9} (4 rows), childless parents {1,4}
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val child = Seq(2L, 2L, 3L, 7L, 7L, 7L, 9L).toDF("fk")
    val got = operators.Integrity.fkAudit("child.fk->parent",
        child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("child.fk->parent", 4L, 2L, 4L, 4L, 2L, false)))
  }

  test("fkAudit on a clean relationship reports ok") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val got = operators.Integrity.fkAudit("c->p", child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("c->p", 2L, 0L, 0L, 3L, 1L, true)))
  }

  test("q196 over testdata: clean FKs, known coverage gaps") {
    import spark.implicits._
    val got = SparkEntry.queries("q196_referential_integrity")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == 6)
    assert(got.forall(r => r._3 == 0L && r._4 == 0L && r._7))
    // events users are a strict subset of customers → childless exist
    val ev = got.find(_._1 == "events.user_id->customer").get
    assert(ev._6 > 0L && ev._6 == ev._5 - ev._2)
  }
}
