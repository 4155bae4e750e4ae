package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-checks for the q138–q144 feature/retrieval family:
  * each query's output at sf0.001 is recomputed by an INDEPENDENT
  * driver-side algorithm (per-key Scala folds over collected rows —
  * fine at spec scale, never a production shape) and compared EXACTLY,
  * double bits included. The DuckDB oracle gates these queries against
  * a second engine; this spec gates them against a second algorithm in
  * the same engine, so an error cancelling across both SQL mirrors
  * cannot hide.
  */
class FeatureQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q138 rolling corr == BigDecimal power-sum fold, bit-exact") {
    val rows = q("q138_rolling_corr")
      .select("user_id", "d", "v", "c", "roll_corr").collect()
    val byKey = rows.groupBy(_.getLong(0))
    var checked = 0
    byKey.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      val win = scala.collection.mutable.Queue.empty[(BigDecimal, BigDecimal)]
      sorted.foreach { r =>
        win.enqueue((BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP), BigDecimal(r.getLong(3))))
        if (win.size > 8) win.dequeue()
        val expected: Option[Double] =
          if (win.size != 8) None
          else {
            val n = 8.0
            val sx = win.map(_._1).sum.toDouble
            val sxx = win.map(p => p._1 * p._1).sum.toDouble
            val sy = win.map(_._2).sum.toDouble
            val syy = win.map(p => p._2 * p._2).sum.toDouble
            val sxy = win.map(p => p._1 * p._2).sum.toDouble
            val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            if (den > 0.0) Some((n * sxy - sx * sy) / den) else None
          }
        val got = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        assert(got == expected, s"row $r")
        if (expected.isDefined) checked += 1
      }
    }
    assert(checked > 50, s"too few full windows exercised: $checked")
  }

  test("q140 winsor bounds == per-day order statistics, exact") {
    val rows = q("q140_cross_sectional_winsor")
      .select("user_id", "d", "v", "rn", "pct_rank", "lo_v", "hi_v", "w_v")
      .collect()
    rows.groupBy(_.getDate(1).toString).foreach { case (_, day) =>
      val vs = day.sortBy(r => (r.getDouble(2), r.getLong(0))).map(_.getDouble(2))
      val n = vs.length
      val kLo = (n + 19) / 20
      val kHi = n - kLo + 1
      val (lo, hi) = (vs(kLo - 1), vs(kHi - 1))
      day.foreach { r =>
        assert(r.getDouble(5) == lo && r.getDouble(6) == hi, s"bounds: $r")
        assert(r.getDouble(7) == math.min(math.max(r.getDouble(2), lo), hi),
          s"winsor: $r")
        val expectedPct =
          if (n == 1) 0.0 else (r.getInt(3) - 1).toDouble / (n - 1).toDouble
        assert(r.getDouble(4) == expectedPct, s"pct_rank: $r")
      }
    }
  }

  test("q141 ATR == per-key Wilder fold over the OHLC bars, bit-exact") {
    val rows = q("q141_atr").select("user_id", "t", "tr", "atr").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1)) // Ewma emits the order col as long
      var atr = 0.0
      sorted.zipWithIndex.foreach { case (r, i) =>
        val tr = r.getDouble(2)
        atr = if (i == 0) tr else (1 - 1.0 / 14.0) * atr + (1.0 / 14.0) * tr
        assert(r.getDouble(3) == atr, s"row $r")
      }
    }
  }

  test("q142 stochastic %K/%D == full brute force from raw events, bit-exact") {
    // independent bar construction: daily high/low; close = value of the
    // lexicographically-last (ts, event_id) — the struct-extreme rule
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getDouble(3)))
    val bars = ev.groupBy(e => (e._1, e._2.toLocalDate)).map { case ((u, d), es) =>
      val close = es.maxBy(e => (e._2, e._3))._4
      (u, d.toEpochDay.toInt, es.map(_._4).max, es.map(_._4).min, close)
    }.toSeq
    val expected = bars.groupBy(_._1).flatMap { case (u, bs) =>
      val sorted = bs.sortBy(_._2).toIndexedSeq
      val ks = sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 13), i + 1)
        val hh = frame.map(_._3).max
        val ll = frame.map(_._4).min
        if (frame.size == 14 && hh > ll)
          Some(100.0 * (sorted(i)._5 - ll) / (hh - ll))
        else None
      }
      sorted.indices.map { i =>
        val pd = (ks(i), ks.lift(i - 1).flatten, ks.lift(i - 2).flatten) match {
          case (Some(a), Some(b), Some(c)) => Some((a + b + c) / 3.0)
          case _ => None
        }
        (u, sorted(i)._2) -> (ks(i), pd)
      }
    }
    val got = q("q142_stochastic_oscillator")
      .select("user_id", "t", "pk", "pd").collect()
    assert(got.nonEmpty)
    var pdChecked = 0
    got.foreach { r =>
      val (ek, ed) = expected((r.getLong(0), r.getInt(1)))
      assert((if (r.isNullAt(2)) None else Some(r.getDouble(2))) == ek, s"pk: $r")
      assert((if (r.isNullAt(3)) None else Some(r.getDouble(3))) == ed, s"pd: $r")
      if (ed.isDefined) pdChecked += 1
    }
    assert(pdChecked > 20, s"too few %D rows exercised: $pdChecked")
  }

  test("q143 BM25 == StrictMath brute force over the collected corpus, bit-exact") {
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id", "split(trim(text), ' +') AS toks").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val terms = Seq("dup", "spark", "scan", "merge")
    val n = docs.length.toLong
    val sumDl = docs.map(_._2.size.toLong).sum
    val dfs = terms.map(t => docs.count(_._2.contains(t)).toLong)
    val avgdl = sumDl.toDouble / n
    def score(toks: Seq[String]): Double = {
      val dl = toks.size
      terms.zip(dfs).map { case (t, df) =>
        val tf = toks.count(_ == t)
        val idf = StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.reduceLeft(_ + _)
    }
    val expected = docs.map { case (id, toks) => (id, score(toks)) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val got = q("q143_bm25_scoring").select("doc_id", "score", "rank").collect()
      .sortBy(_.getInt(2)).map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == expected.toSeq)
  }

  test("q148 rolling median == sorted-frame middle element, exact") {
    val rows = q("q148_rolling_median")
      .select("user_id", "d", "v", "med7").collect()
    var full = 0
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expected =
          if (i < 6) None
          else Some(sorted.slice(i - 6, i + 1).map(_.getDouble(2)).sorted.apply(3))
        assert((if (r.isNullAt(3)) None else Some(r.getDouble(3))) == expected,
          s"row $r")
        if (expected.isDefined) full += 1
      }
    }
    assert(full > 50, s"too few full frames: $full")
  }

  test("q149 robust z == per-day median/MAD order statistics, bit-exact") {
    val rows = q("q149_robust_zscore")
      .select("user_id", "d", "v", "med", "mad", "rz").collect()
    rows.groupBy(_.getDate(1).toString).foreach { case (_, day) =>
      def medOf(xs: Seq[(Double, Long)]): Double = {
        val s = xs.sortBy(identity).map(_._1)
        val n = s.length
        (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2.0
      }
      val med = medOf(day.map(r => (r.getDouble(2), r.getLong(0))).toSeq)
      val mad = medOf(day.map(r => (math.abs(r.getDouble(2) - med), r.getLong(0))).toSeq)
      day.foreach { r =>
        assert(r.getDouble(3) == med && r.getDouble(4) == mad, s"center: $r")
        val rz = if (mad > 0.0) Some((r.getDouble(2) - med) / (1.4826 * mad))
          else None
        assert((if (r.isNullAt(5)) None else Some(r.getDouble(5))) == rz, s"rz: $r")
      }
    }
  }

  test("q150 running distinct == expanding nunique fold, exact") {
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3)))
    val expected: Map[Long, Long] = ev.groupBy(_._1).iterator.flatMap {
      case (_, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        val seen = scala.collection.mutable.Set.empty[String]
        sorted.map { e => seen += e._4; e._3 -> seen.size.toLong }
    }.toMap
    val got = q("q150_running_distinct").select("event_id", "n_types_so_far")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (id, n) => assert(n == expected(id), s"event $id") }
    assert(got.length == ev.length)
  }

  test("q144 conjunctive search == brute-force intersection") {
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id", "split(trim(text), ' +') AS toks").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val expected = docs.flatMap { case (id, toks) =>
      val (d, v) = (toks.count(_ == "dup"), toks.count(_ == "vector"))
      if (d > 0 && v > 0) Some((id, d.toLong, v.toLong)) else None
    }.sortBy(_._1)
    val got = q("q144_inverted_index_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    assert(expected.nonEmpty, "query terms never co-occur — test is vacuous")
  }
}
