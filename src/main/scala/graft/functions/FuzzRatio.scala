package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the reference's `fuzz.ratio`
  * (thefuzz / rapidfuzz similarity, 0..100).
  *
  * Semantics: normalized Indel similarity — `round(200 * LCS(a,b) / (|a|+|b|))`
  * with banker's rounding (Python `round`), which is what
  * `thefuzz.fuzz.ratio` computes (reference usage:
  * src/vlos/matching/name_matcher.py:36-38, src/vlos/matching/activity_matcher.py:228).
  *
  * Implemented as a codegen-participating `BinaryExpression` (the generated
  * code calls the static `FuzzRatio.ratio`, same pattern as Spark's own
  * `Levenshtein`), so scoring joins stay inside whole-stage codegen.
  * Names are short (< 64 chars) so the O(|a|·|b|) LCS DP with a rolling
  * one-row buffer is cheap and allocation-light.
  */
case class FuzzRatioExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[StringType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  override def prettyName: String = "fuzz_ratio"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FuzzRatio.ratio(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FuzzRatio.ratio($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FuzzRatioExpr =
    copy(left = newLeft, right = newRight)
}

object FuzzRatio {

  /** rapidfuzz-compatible ratio over UTF8 strings (code-point based). */
  def ratio(a: UTF8String, b: UTF8String): Int = ratio(a.toString, b.toString)

  def ratio(a: String, b: String): Int = {
    // genuine code points (rapidfuzz iterates characters, not UTF-16 units):
    // surrogate pairs (emoji, rare CJK) count once and compare as one unit
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val m = ca.length
    val n = cb.length
    if (m + n == 0) return 100 // rapidfuzz: ratio("", "") == 100
    if (m == 0 || n == 0) return 0
    val lcs = lcsLength(ca, cb)
    // Python round() is banker's rounding; rint matches.
    math.rint(200.0 * lcs / (m + n)).toInt
  }

  /** Classic LCS with a single rolling row: O(m*n) time, O(n) space. */
  private def lcsLength(a: Array[Int], b: Array[Int]): Int = {
    val n = b.length
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var i = 0
    while (i < a.length) {
      val ca = a(i)
      var j = 0
      while (j < n) {
        cur(j + 1) =
          if (ca == b(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }

  /** Register `fuzz_ratio` in the session's function registry so it is usable
    * from both SQL text and `call_function("fuzz_ratio", ...)`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fuzz_ratio", exprs => FuzzRatioExpr(exprs(0), exprs(1)), "built-in")
    // the session-registration entry point for all graft native functions
    MentionExtract.register(spark)
    VectorOps.register(spark)
  }
}
