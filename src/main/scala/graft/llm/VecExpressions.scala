package graft.llm

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst kernel for the similarity surface (SURVEY.md §7.2 v5):
  * the dot product is THE inner loop of cosine top-k / near-dup queries
  * (reference capability: embedding similarity; cf. the exact baseline
  * q28). The SQL form `aggregate(zip_with(...))` builds a result array and
  * interprets two lambdas per row; this expression compiles to a single
  * static call over the columnar `ArrayData` — no per-element boxing, no
  * intermediate array — and inlines into whole-stage codegen like the
  * geometry kernel's `StArea`. */
object VecCodegen {
  /** Static entry point referenced from generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** vec_dot(array&lt;double&gt;, array&lt;double&gt;) → double. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecCodegen.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.llm.VecCodegen.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
}
