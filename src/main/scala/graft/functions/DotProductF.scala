package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd float-vector dot product: sum_i (double)a[i] * (double)b[i],
  * accumulated SEQUENTIALLY from index 0 with a 0.0 start — the exact
  * fold order of `aggregate(zip_with(a, b, ...), 0.0d, ...)` and of
  * DuckDB's `list_reduce`, so results stay bit-identical to the oracle
  * while dropping the interpreted higher-order-function machinery (per-
  * element lambda dispatch + intermediate array allocation) that
  * dominates the brute-force KNN profile.
  *
  * Null semantics: null if either array is null; array ELEMENTS are
  * assumed non-null (embedding vectors), matching zip_with on the same
  * data. A LENGTH MISMATCH yields null — exactly what the replaced
  * `aggregate(zip_with(...))` shape computes (zip_with null-pads the
  * shorter side, the null poisons the product and then the running sum)
  * and what the DuckDB oracle's out-of-range `element_at` produces. A
  * malformed (≠ fixed-dimension) corpus therefore nulls out identically
  * whether or not the rewrite rule is registered, instead of silently
  * diverging into a min-length partial sum.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be ARRAY<FLOAT>; callers go through DotProductF.dot which
  // types the columns. (ExpectsInputTypes' AbstractDataType went
  // private[sql] in Spark 4, so validation lives at the API layer.)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"
  // null on null input, but ALSO on length mismatch with non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object DotProductF {
  /** Column API: dot product of two ARRAY<FLOAT> columns as DOUBLE. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductF(GraftBridge.expression(a), GraftBridge.expression(b)))
}
