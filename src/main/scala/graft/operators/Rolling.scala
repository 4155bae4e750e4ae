package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact rolling moments over window frames.
  *
  * The reference computes rolling variance with np.var (population,
  * ddof=0; EDA.ipynb:1615) and rolling skew with pandas' bias-corrected
  * sample skewness G1 (transform_data.ipynb:524). Spark's streaming moment
  * aggregates (`var_pop`, `skewness`) accumulate doubles in partition
  * order, so their low bits are not reproducible across engines. Here all
  * moments come from exact DECIMAL power sums (the inputs carry <=2
  * decimals), combined in one fixed IEEE expression — bit-identical in any
  * engine that evaluates the same formula, which is what the DuckDB oracle
  * does.
  *
  * Scale notes: a frame sum is a single pass over the window buffer; the
  * three power sums share one Exchange+Sort like any other window stack.
  */
object Rolling {

  private val D = DecimalType(12, 2)
  private def d(c: Column): Column = c.cast(D)

  def s1(c: Column, w: WindowSpec): Column = sum(d(c)).over(w).cast(DoubleType)
  def s2(c: Column, w: WindowSpec): Column = sum(d(c) * d(c)).over(w).cast(DoubleType)
  def s3(c: Column, w: WindowSpec): Column = sum(d(c) * d(c) * d(c)).over(w).cast(DoubleType)
  def n(c: Column, w: WindowSpec): Column = count(c).over(w)

  /** Population variance (np.var ddof=0) over the frame; null unless the
    * frame holds exactly `full` values (pandas min_periods semantics). */
  def varPop(c: Column, w: WindowSpec, full: Int): Column = {
    val nn = n(c, w)
    val s = s1(c, w)
    val q = s2(c, w)
    when(nn === full, (q - s * s / nn) / nn)
  }

  /** Rolling mean, null unless the frame is full (pandas min_periods). */
  def mean(c: Column, w: WindowSpec, full: Int): Column = {
    val nn = n(c, w)
    when(nn === full, s1(c, w) / nn)
  }

  /** Bias-corrected sample skewness G1 (pandas rolling(...).skew()) from
    * already-materialized power-sum columns — compute the sums ONCE with
    * [[s1]]/[[s2]]/[[s3]]/[[n]] into named columns first, then apply this
    * per-row formula. (Inlining the window sums into the formula tree
    * makes Spark evaluate every occurrence as its own window aggregate —
    * a 15x window-buffer blowup measured at sf0.1.)
    * G1 = g1 * sqrt(n(n-1))/(n-2) with g1 = m3 / m2^1.5. */
  def skewG1FromSums(nC: Column, aC: Column, bC: Column, cC: Column,
                     full: Int): Column = {
    val nn = nC.cast(DoubleType)
    val mean = aC / nn
    val m2 = bC / nn - mean * mean
    val m3 = cC / nn - lit(3.0) * mean * (bC / nn) + lit(2.0) * mean * mean * mean
    // m2*sqrt(m2) instead of pow(m2, 1.5): sqrt/mul are correctly-rounded
    // IEEE ops, pow is not (libm vs Math.pow differ by ulps).
    val g1 = m3 / (m2 * sqrt(m2))
    val corr = sqrt(nn * (nn - lit(1.0))) / (nn - lit(2.0))
    when(nC === full && m2 > 0, g1 * corr)
  }

  /** The ANSI spellings of the same formulas for oracle SQL. `frame` is
    * e.g. "PARTITION BY user_id ORDER BY ts ROWS BETWEEN 7 PRECEDING AND
    * CURRENT ROW". */
  object Sql {
    def s1(x: String, frame: String) =
      s"CAST(SUM(CAST($x AS DECIMAL(12,2))) OVER ($frame) AS DOUBLE)"
    def s2(x: String, frame: String) =
      s"CAST(SUM(CAST($x AS DECIMAL(12,2)) * CAST($x AS DECIMAL(12,2))) OVER ($frame) AS DOUBLE)"
    def s3(x: String, frame: String) =
      s"CAST(SUM(CAST($x AS DECIMAL(12,2)) * CAST($x AS DECIMAL(12,2)) * CAST($x AS DECIMAL(12,2))) OVER ($frame) AS DOUBLE)"
    def n(x: String, frame: String) = s"COUNT($x) OVER ($frame)"

    def varPop(x: String, frame: String, full: Int): String = {
      val (s, q, nn) = (s1(x, frame), s2(x, frame), n(x, frame))
      s"CASE WHEN $nn = $full THEN ($q - $s * $s / $nn) / $nn END"
    }
    def mean(x: String, frame: String, full: Int): String = {
      val (s, nn) = (s1(x, frame), n(x, frame))
      s"CASE WHEN $nn = $full THEN $s / $nn END"
    }
    def skewG1(x: String, frame: String, full: Int): String = {
      val (a, b, c, nn) = (s1(x, frame), s2(x, frame), s3(x, frame), n(x, frame))
      val nd = s"CAST($nn AS DOUBLE)"
      val mean = s"($a / $nd)"
      val m2 = s"($b / $nd - $mean * $mean)"
      val m3 = s"($c / $nd - 3.0 * $mean * ($b / $nd) + 2.0 * $mean * $mean * $mean)"
      s"CASE WHEN $nn = $full AND $m2 > 0 THEN " +
        s"($m3 / ($m2 * SQRT($m2))) * (SQRT($nd * ($nd - 1.0)) / ($nd - 2.0)) END"
    }
  }
}
