package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-sketch membership probe over a STRING column — the
  * native-expression replacement for a closure UDF in sketch-prefilter
  * plans (q86): `bloom_might_contain_f(value, bloomBytes)` stays inside
  * WholeStageCodegen, so the prefilter fuses with the scan projection
  * instead of breaking the codegen span.
  *
  * Hash contract: probes `mightContainBinary(utf8Bytes)`, which is the
  * same UTF-8-bytes hash path `putString`/`DataFrameStatFunctions
  * .bloomFilter` use to insert string items, so a filter built by
  * `df.stat.bloomFilter` never false-negatives here (asserted by
  * BloomMightContainFSpec against 1000 known members).
  *
  * Null semantics: standard BinaryExpression null-intolerance — null
  * value (or null bloom) yields null, which a WHERE treats as false,
  * identical to the `t != null && mightContain(t)` closure it replaces.
  *
  * Shipping: the serialized sketch rides the plan as a BinaryType
  * Literal and reaches executors via the codegen reference array —
  * right-sized for eval-set sketches up to tens of MB. For a
  * multi-GB sketch (1e10 items), swap the Literal for a broadcast-
  * variable-backed child; the probe code is unchanged. That seam, not
  * this expression, is the only thing that changes at 100 TB.
  */
case class BloomMightContainF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_f"

  // The sketch deserializes once per executor (transient lazy); `right`
  // must be foldable (a literal) so it can be evaluated input-free.
  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom bytes must be a non-null literal")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Codegen entry point — public so the generated class can call it. */
  def mightContain(s: UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(v: Any, b: Any): Any =
    mightContain(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContainF].getName)
      s"${ev.value} = $ref.mightContain($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainF =
    copy(left = newLeft, right = newRight)
}

object BloomMightContainF {
  /** Column API: membership probe of a STRING column against a built
    * [[BloomFilter]]; the sketch is serialized into the plan. */
  def probe(value: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    GraftBridge.column(BloomMightContainF(
      GraftBridge.expression(value), Literal(bos.toByteArray, BinaryType)))
  }
}
