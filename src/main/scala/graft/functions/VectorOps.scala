package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen-participating vector kernels for the similarity/dedup family.
  *
  * The round-5 shape computed cosine and hyperplane dots with higher-order
  * functions (`zip_with` + `aggregate`): those expressions are evaluated by
  * the INTERPRETED lambda path (no whole-stage codegen), and each evaluation
  * allocates an intermediate array per row-pair. In the brute-force baseline
  * (`Similarity.bruteForceTopK`) that kernel runs O(n²) times — measured at
  * sf0.1 (2000 vectors, 4M ordered pairs × 3 folds × 64 dims) the
  * interpreted path took ~49 s of the ~50 s query; the LSH bucketing
  * evaluates 128 hyperplane folds per row the same way.
  *
  * These expressions compute the IDENTICAL IEEE-754 arithmetic — the same
  * left-to-right accumulation order as the sequential `aggregate` fold, the
  * same `dot / (sqrt(na) * sqrt(nb))` combination — inside whole-stage
  * codegen with zero allocation (the generated code is a static call, same
  * pattern as [[FuzzRatioExpr]] / [[MentionExtractExpr]]). Results are
  * bit-identical; the DuckDB oracle mirrors are untouched.
  *
  * Null semantics replicate the HOF graph exactly:
  *  - `zip_with` pads the shorter array with nulls and `aggregate`
  *    null-poisons, so a length mismatch or a null element yields a null
  *    dot product → these kernels return null in the same cases;
  *  - for cosine, a null element poisons dot, na and nb alike — the
  *    combined result is null, so one null check covers it.
  */
object VectorOps {

  /** Exact cosine similarity, same fold order as
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_) / (sqrt(Σa²)·sqrt(Σb²))`.
    * Returns null (boxed) when lengths differ or any element is null.
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Plain dot product, same fold order as
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)`; null on length mismatch or
    * null element (zip_with padding / aggregate null-poisoning semantics).
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** `cosine` as a Column over two array<double> columns (requires
    * [[FuzzRatio.register]] once per session — the registration entry point
    * for all graft native functions).
    */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** `dot` as a Column over two array<double> columns (same registration). */
  def vecDot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotExpr(exprs(0), exprs(1)), "built-in")
  }
}

sealed abstract class VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null is also produced for NON-null inputs (null element / length
  // mismatch), so nullable is unconditional
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType]) &&
        children.forall(_.dataType.asInstanceOf[ArrayType].elementType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  protected def kernelName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}$$boxed =
        graft.functions.VectorOps.$kernelName($a, $b);
      if (${ev.value}$$boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}$$boxed.doubleValue(); }
    """)
}

/** Whole-stage-codegen cosine similarity (see [[VectorOps]]). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends VectorBinaryExpr {
  override def prettyName: String = "cosine_sim"
  override protected def kernelName: String = "cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Whole-stage-codegen dot product (see [[VectorOps]]). */
case class VecDotExpr(left: Expression, right: Expression)
    extends VectorBinaryExpr {
  override def prettyName: String = "vec_dot"
  override protected def kernelName: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}
