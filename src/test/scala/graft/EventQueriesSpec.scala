package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force re-derivations for the q189-q192 event-analytics batch
  * (drift TVD, retention cohorts, ordered funnel, SCD2 intervals). The
  * DuckDB gate certifies engine-vs-engine parity at sf0.01; these
  * suites re-derive the SEMANTICS independently in plain Scala on
  * sf0.001 — catching the class of bug where both SQL formulations
  * share the same misreading (e.g. a funnel that ignores stage order,
  * which plain conditional aggregation would happily hash-match).
  */
class EventQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** (user_id, event_id, epoch_us, event_type, value) — normalized. */
  private lazy val raw: Seq[(Long, Long, Long, String, Double)] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect().toSeq
  }

  test("q189 TVD matches a plain-Scala re-derivation") {
    import spark.implicits._
    val got = SparkEntry.queries("q189_drift_tvd")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val mid = (raw.map(_._3).min + raw.map(_._3).max) / 2
    val byType = raw.groupBy(_._4)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (tpe, rows) =>
      val early = rows.filter(_._3 <= mid)
      val late = rows.filter(_._3 > mid)
      val ce = early.groupBy(r => math.floor(r._5).toLong).map { case (b, g) => b -> g.size.toLong }
      val cl = late.groupBy(r => math.floor(r._5).toLong).map { case (b, g) => b -> g.size.toLong }
      val buckets = (ce.keySet ++ cl.keySet)
      val nE = early.size.toLong; val nL = late.size.toLong
      val num = buckets.toSeq.map { b =>
        math.abs(ce.getOrElse(b, 0L) * nL - cl.getOrElse(b, 0L) * nE)
      }.sum
      val tvd = num.toDouble / (2.0 * nE * nL)
      val (gE, gL, gB, gTvd) = got(tpe)
      assert(gE == nE && gL == nL && gB == buckets.size.toLong, s"counts for $tpe")
      assert(gTvd == tvd, s"tvd for $tpe: got $gTvd want $tvd")
      assert(tvd >= 0.0 && tvd <= 1.0)
    }
  }

  test("q191 funnel respects stage ORDER and the 7-day window") {
    import spark.implicits._
    val got = SparkEntry.queries("q191_event_funnel")(spark, dir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val week = 7L * 24 * 3600 * 1000000L
    val byUser = raw.groupBy(_._1)
    def stageMin(rows: Seq[(Long, Long, Long, String, Double)], tpe: String,
        lo: Long, hi: Long): Option[Long] = {
      val c = rows.filter(r => r._4 == tpe && r._3 >= lo && r._3 <= hi)
      if (c.isEmpty) None else Some(c.map(_._3).min)
    }
    var n1, n2, n3 = 0L
    byUser.values.foreach { rows =>
      stageMin(rows, "view", Long.MinValue, Long.MaxValue).foreach { t1 =>
        n1 += 1
        stageMin(rows, "click", t1, t1 + week).foreach { t2 =>
          n2 += 1
          stageMin(rows, "purchase", t2, t2 + week).foreach { _ => n3 += 1 }
        }
      }
    }
    assert(got("1_view") == ((n1, n1.toDouble / n1)))
    assert(got("2_click") == ((n2, n2.toDouble / n1)))
    assert(got("3_purchase") == ((n3, n3.toDouble / n1)))
  }

  test("funnel operator: order and window constraints bind (injected edges)") {
    import spark.implicits._
    val week = 7L * 24 * 3600 * 1000000L
    // u1 converts fully; u2 clicked BEFORE its first view (no stage 2);
    // u3 clicked 8 days after the view (outside the window); u4 has a
    // pre-view click AND a valid later click (stage 2 anchors on the
    // valid one, not the early one).
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 50L), (2L, "view", 100L), (2L, "purchase", 150L),
      (3L, "view", 100L), (3L, "click", 100L + week + 1L),
      (4L, "click", 10L), (4L, "view", 100L), (4L, "click", 500L),
      (4L, "purchase", 600L)
    ).toDF("user_id", "event_type", "us")
    val got = operators.Funnel.report(ev, "user_id", "event_type", "us",
        Seq("view", "click", "purchase"), week)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 2L))
    // anchors: u4's stage-2 anchor must be the valid 500, not the 10
    val a = operators.Funnel.anchors(ev, "user_id", "event_type", "us",
      Seq("view", "click"), week)
    val t2 = a(1).as[(Long, Long)].collect().toMap
    assert(t2 == Map(1L -> 200L, 4L -> 500L))
  }

  test("q192 SCD2 intervals tile each user's timeline exactly") {
    import spark.implicits._
    val got = SparkEntry.queries("q192_scd2_intervals")(spark, dir)
      .as[(Long, Long, Int, Long, Option[Long], Boolean, Long)].collect()
    // brute force islands
    val want = raw.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
        .map(r => (r._3, math.floor(r._5 / 100.0).toInt))
      val runs = ordered.foldLeft(Vector.empty[(Int, Long, Long)]) {
        case (acc, (us, tier)) =>
          if (acc.nonEmpty && acc.last._1 == tier)
            acc.init :+ ((tier, acc.last._2, acc.last._3 + 1))
          else acc :+ ((tier, us, 1L))
      }
      runs.zipWithIndex.map { case ((tier, from, n), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (uid, (i + 1).toLong, tier, from, to, to.isEmpty, n)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq.sortBy(r => (r._1, r._2)) == want)
    // interval tiling: within a user, valid_to == next valid_from and
    // exactly one open (current) row
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.count(_._6) == 1)
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4))
        case _ =>
      }
    }
  }

  test("q193 PIT join equals a brute-force as-of-time tier lookup") {
    import spark.implicits._
    val got = SparkEntry.queries("q193_pit_feature_join")(spark, dir)
      .as[(Option[Int], Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // brute force: the tier in force at time t is the tier of the last
    // NON-purchase event at or before t (ordered by (us, event_id));
    // a purchase with no prior non-purchase activity gets NULL
    val byUser = raw.groupBy(_._1).map { case (u, rows) =>
      u -> rows.filter(_._4 != "purchase").sortBy(r => (r._3, r._2))
        .map(r => (r._3, math.floor(r._5 / 100.0).toInt))
    }
    val assigns = raw.filter(_._4 == "purchase").map { p =>
      val prior = byUser(p._1).takeWhile(_._1 <= p._3)
      (prior.lastOption.map(_._2), p._1, p._5)
    }
    // the exclusion must bind: at least one tier differs from the
    // purchase's own floor(value/100) (else the dim is degenerate)
    assert(raw.filter(_._4 == "purchase").exists { p =>
      val prior = byUser(p._1).takeWhile(_._1 <= p._3)
      prior.lastOption.map(_._2)
        .exists(_ != math.floor(p._5 / 100.0).toInt)
    })
    val want = assigns.groupBy(_._1).map { case (tier, g) =>
      val spend = g.map(r => BigDecimal(r._3).setScale(2)).sum.toDouble
      tier -> ((g.size.toLong, g.map(_._2).distinct.size.toLong, spend))
    }
    assert(got == want)
  }

  test("q194 transition matrix equals brute-force bigram counts") {
    import spark.implicits._
    val got = SparkEntry.queries("q194_markov_transitions")(spark, dir)
      .as[(String, String, Long, Double)].collect()
    val bigrams = raw.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val o = rows.sortBy(r => (r._3, r._2)).map(_._4)
      o.zip(o.drop(1))
    }
    val counts = bigrams.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val rowTot = bigrams.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    assert(got.length == counts.size)
    got.foreach { case (a, b, n, p) =>
      assert(counts((a, b)) == n)
      assert(p == n.toDouble / rowTot(a))
    }
    // probabilities row-sum to 1 exactly in rational terms
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sum == rowTot(rows.head._1))
    }
  }

  test("q195 survival summary equals brute-force per-cohort stats") {
    import spark.implicits._
    val got = SparkEntry.queries("q195_time_to_convert")(spark, dir)
      .as[(java.sql.Date, Long, Long, Double, Option[Long], Option[Long],
           Option[Long], Option[Double])].collect()
    val signups = raw.filter(_._4 == "signup").groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._3).min }
    def weekOf(us: Long): Long = { // Monday-truncated epoch days
      val day = Math.floorDiv(us, 86400000000L)
      day - Math.floorMod(day + 3, 7L) // 1970-01-01 was a Thursday
    }
    val deltas = signups.toSeq.flatMap { case (u, t1) =>
      val ps = raw.filter(r => r._1 == u && r._4 == "purchase" && r._3 >= t1)
      if (ps.isEmpty) None else Some((weekOf(t1), ps.map(_._3).min - t1))
    }
    val nSign = signups.toSeq.groupBy { case (_, t1) => weekOf(t1) }
      .map { case (w, g) => w -> g.size.toLong }
    got.foreach { case (cohort, ns, nc, pct, mn, med, mx, mean) =>
      val w = Math.floorDiv(cohort.toLocalDate.toEpochDay, 1L)
      assert(nSign(w) == ns)
      val d = deltas.filter(_._1 == w).map(_._2).sorted
      assert(nc == d.size.toLong)
      assert(pct == nc.toDouble / ns)
      if (d.nonEmpty) {
        assert(mn.contains(d.head) && mx.contains(d.last))
        assert(med.contains(d((d.size + 1) / 2 - 1)))
        assert(mean.contains(d.sum.toDouble / d.size))
      }
    }
    assert(got.map(_._2).sum == signups.size.toLong)
  }

  test("q197 time-in-state: durations tile each user's observed span") {
    import spark.implicits._
    val got = SparkEntry.queries("q197_time_in_state")(spark, dir)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    // brute force from raw events
    val endUs = raw.map(_._3).max
    val runs = raw.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val o = rows.sortBy(r => (r._3, r._2))
        .map(r => (r._3, math.floor(r._5 / 100.0).toInt))
      val starts = o.zipWithIndex.filter { case ((_, t), i) =>
        i == 0 || o(i - 1)._2 != t }.map(_._1)
      starts.zipWithIndex.map { case ((from, tier), i) =>
        val to = if (i + 1 < starts.size) Some(starts(i + 1)._1) else None
        (tier, to.getOrElse(endUs) - from, to.isEmpty)
      }
    }
    val want = runs.groupBy(_._1).map { case (tier, g) =>
      val tot = g.map(r => BigInt(r._2)).sum.toDouble
      (tier, g.size.toLong, g.count(_._3).toLong, tot)
    }.toSet
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSet == want)
    // intervals close at the GLOBAL observation end, so per user the
    // durations tile (global_end - user_first_event); the report's
    // grand total equals the sum of those spans
    val spans = raw.groupBy(_._1).values
      .map(rows => BigInt(endUs - rows.map(_._3).min)).sum
    assert(got.map(r => BigDecimal(r._4)).sum == BigDecimal(spans))
    got.foreach { r =>
      assert(r._5 == r._4 / r._2)
      assert(r._6 >= 0.0 && r._6 <= 1.0)
    }
  }

  test("Scd2 operator: tie-broken islands on duplicate times (injected)") {
    import spark.implicits._
    // two events share time 100; tie broken by id: attr goes 1→2→2→1
    val df = Seq((1L, 10L, 50L, 1), (1L, 11L, 100L, 2), (1L, 12L, 100L, 2),
      (1L, 13L, 200L, 1)).toDF("k", "id", "t", "a")
    val got = operators.Scd2.intervals(df, "k", "t", "id", "a")
      .as[(Long, Long, Int, Long, Option[Long], Boolean, Long)]
      .collect().sortBy(_._2)
    assert(got.toSeq == Seq(
      (1L, 1L, 1, 50L, Some(100L), false, 1L),
      (1L, 2L, 2, 100L, Some(200L), false, 2L),
      (1L, 3L, 1, 200L, None, true, 1L)))
  }

  test("q190 cohort matrix row counts are triangular and complete") {
    import spark.implicits._
    val got = SparkEntry.queries("q190_retention_cohorts")(spark, dir)
      .as[(java.sql.Date, Int, Long, Long)].collect()
    // every user appears in offset 0 of exactly one cohort
    val users = raw.map(_._1).distinct.size.toLong
    assert(got.filter(_._2 == 0).map(_._3).sum == users)
    // n_events across the matrix == total events
    assert(got.map(_._4).sum == raw.size.toLong)
    assert(got.forall(_._2 >= 0))
  }
}
