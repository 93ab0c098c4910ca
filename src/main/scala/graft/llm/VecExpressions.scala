package graft.llm

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst kernel for the similarity surface (SURVEY.md §7.2 v5):
  * the dot product is THE inner loop of cosine top-k / near-dup queries
  * (reference capability: embedding similarity; cf. the exact baseline
  * q28). The SQL form `aggregate(zip_with(...))` builds a result array and
  * interprets two lambdas per row; this expression compiles to a single
  * static call over the columnar `ArrayData` — no per-element boxing, no
  * intermediate array — and inlines into whole-stage codegen like the
  * geometry kernel's `StArea`. */
object VecCodegen {
  /** Static entry point referenced from generated code. Null elements are
    * skipped (contribute 0 to the sum) — matching SQL sum-over-products
    * null semantics rather than poisoning the whole dot product. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** vec_dot(array&lt;double&gt;, array&lt;double&gt;) → double. Checks its
  * input types at analysis so an array&lt;int&gt;/array&lt;float&gt;
  * argument is a clear error instead of being silently read as garbage
  * doubles via ArrayData.getDouble (callers cast, e.g.
  * `cast(ArrayType(DoubleType))`). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<double>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecCodegen.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.llm.VecCodegen.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
}
