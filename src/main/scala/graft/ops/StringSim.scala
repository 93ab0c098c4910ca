package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression — the
  * entity-resolution scorer next to q89's Levenshtein (Spark ships
  * `levenshtein` but no Jaro-Winkler; DuckDB ships both, which gives the
  * oracle). Standard textbook definition (Winkler 1990) scored over the
  * RAW UTF-8 BYTES — DuckDB's strings are UTF-8 byte arrays, so byte
  * scoring matches its semantics exactly for ASCII and multi-byte text
  * alike (validated empirically in JaroWinklerSpec, incl. non-ASCII):
  * match window floor(max(|a|,|b|)/2)-1, transpositions = half the
  * mismatched matched positions, prefix boost p=0.1 capped at 4 applied
  * only when jaro > 0.7, empty input → 0.
  *
  * Codegen: `doGenCode` emits a static call into [[StringSimCodegen]] —
  * the same shape as Spark's own `levenshtein` and the geo expressions,
  * so the scorer inlines into whole-stage codegen on the blocked-join
  * hot path instead of going through ScalaUDF conversion. */
object StringSimCodegen {

  /** Static entry point referenced from generated code. Scores the raw
    * UTF-8 bytes for ALL inputs — exactly what DuckDB's
    * jaro_winkler_similarity does (its strings are UTF-8 byte arrays),
    * so ASCII and multi-byte text agree with the q125 oracle alike. This
    * is also the fast path: two small byte-array copies per evaluation,
    * no String decode, which halves the per-pair cost on the
    * millions-of-pairs blocked join. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    jaroBytes(a.getBytes, b.getBytes)

  private def jaroBytes(sa: Array[Byte], sb: Array[Byte]): Double = {
    val la = sa.length
    val lb = sb.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && sa(i) == sb(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatched = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (sa(i) != sb(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // DuckDB floors the transposition count (t = mismatched div 2, an
    // integer). The two matched subsequences are equal as multisets, so a
    // single mismatched position is impossible — but an odd count >= 3
    // arises whenever the rearrangement contains an odd cycle (e.g. the
    // aligned windows read abc vs bca: all three positions differ), and
    // keeping the half (1.5) diverges from the oracle scorer — verified
    // against jaro_winkler_similarity('Customer#00001207',
    // 'Customer#000001207') = 0.9771242 (t=1), not 0.9712 (t=1.5).
    val t = (mismatched / 2).toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && sa(prefix) == sb(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** String convenience (specs, driver-side use): same UTF-8-byte scoring
    * as the expression path, so the spec exercises the real kernel. */
  def jaroWinklerImpl(sa: String, sb: String): Double =
    jaroBytes(sa.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      sb.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  // analysis-time type check + implicit casts (same contract as Spark's
  // own Levenshtein) instead of a runtime ClassCastException. Return type
  // left inferred: naming AbstractDataType is private[sql]-restricted.
  override def inputTypes = Seq(StringType, StringType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimCodegen.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.ops.StringSimCodegen.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(l, r)
}

object StringSim {
  /** Column API (via the registered function, same pattern as the geo
    * expressions). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("jaro_winkler", a, b)
}
