package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd Count-Min frequency probe over a STRING column:
  * `estimateCount(value) >= threshold`. The frequency sibling of
  * [[BloomMightContainF]] (membership) and q44's HLL (cardinality):
  * because a Count-Min estimate only OVERcounts, `estimate >= T` can
  * never be false for a truly-heavy item — so using it as a prefilter
  * ahead of an exact keyed count keeps results exact while the shuffle
  * carries only plausibly-heavy keys (q99).
  *
  * Same shipping contract as BloomMightContainF: the serialized sketch
  * rides the plan as a BinaryType literal, deserializes once per
  * executor, and the probe fuses into the scan-side codegen span.
  * The threshold is a constructor parameter, not a child — this
  * expression is Column-API only (no SQL registration).
  */
case class CountMinGteF(left: Expression, right: Expression, threshold: Long)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "count_min_gte_f"

  @transient private lazy val cms: CountMinSketch = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: sketch bytes must be a non-null literal")
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Codegen entry point — public so the generated class can call it.
    * `toString` matches the String hash path `df.stat.countMinSketch`
    * inserts with, so overestimation (never under) is preserved. */
  def gte(s: UTF8String): Boolean =
    cms.estimateCount(s.toString) >= threshold

  override protected def nullSafeEval(v: Any, b: Any): Any =
    gte(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CountMinGteF].getName)
      s"${ev.value} = $ref.gte($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinGteF =
    copy(left = newLeft, right = newRight)
}

object CountMinGteF {
  /** Column API: `estimateCount(value) >= threshold` against a built
    * [[CountMinSketch]]; the sketch is serialized into the plan. */
  def probe(value: Column, cms: CountMinSketch, threshold: Long): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    GraftBridge.column(CountMinGteF(
      GraftBridge.expression(value), Literal(bos.toByteArray, BinaryType), threshold))
  }
}
