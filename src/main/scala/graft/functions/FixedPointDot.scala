package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `fp_dot(a, b)` — the engine's fixed-point dot-product contract
  * (Σ floor(aᵢ·bᵢ·1e12 + 0.5) as BIGINT, see the Embeddings scaladoc) as
  * a native Catalyst `Expression` with `doGenCode` (SURVEY §4.2).
  *
  * The declarative vector queries previously spelled this as
  * `aggregate(zip_with(a, b, …), …)`: higher-order functions build a
  * per-element lambda frame and evaluate INTERPRETED — they also
  * materialize the zipped intermediate array per row. This expression is
  * a tight primitive loop over the two `ArrayData` buffers inside
  * whole-stage codegen: no intermediate array, no lambda dispatch, and
  * byte-identical results to both the HOF form and the kernels' JVM fold
  * (same single IEEE multiply/multiply/add and floor per element) — so
  * swapping forms cannot move any oracle hash.
  *
  * Arrays of unequal length reduce over the common prefix (the engine
  * only ever compares same-dimension vectors; `zip_with` would instead
  * null-pad and poison the sum — a divergence that cannot arise on
  * equal-length inputs, pinned in FixedPointDotSpec). A null ELEMENT in
  * either array (accepted: parquet-sourced arrays are containsNull=true
  * even when the data has no nulls) nulls the whole result, matching the
  * HOF form's null propagation exactly (ADVICE r5).
  */
case class FixedPointDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fp_dot requires two array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  // a null ELEMENT nulls the whole sum (matching aggregate(zip_with(…)):
  // null * x → null, acc + null → null) — so the result is nullable even
  // over non-null array columns when their elements are nullable
  override def nullable: Boolean =
    super.nullable || (Seq(left.dataType, right.dataType) exists {
      case ArrayType(_, cn) => cn
      case _ => false
    })

  override def dataType: DataType = LongType
  override def prettyName: String = "fp_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (FixedPointDot.hasNullSlot(x, y)) null else FixedPointDot.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // two static calls, loops inlined JIT-side: keeps the generated
    // method small (the repo's documented codegen-method-limit pitfall)
    // while staying inside the whole-stage-generated row loop. The null
    // pre-scan is bit-tests only; the sum stays a primitive long (no
    // per-row boxing on the hot path).
    //
    // When `nullable` is false (non-nullable inputs, containsNull=false
    // elements) no null slot can exist AND nullSafeCodeGen never declares
    // `ev.isNull` (it is FalseLiteral) — writing to it would emit
    // `false = true;` and fail Janino compilation, silently dropping the
    // whole stage to interpreted execution. Emit the plain dot there.
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (nullable)
        s"""if (graft.functions.FixedPointDot.hasNullSlot($a, $b)) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.FixedPointDot.dot($a, $b);
           |}""".stripMargin
      else
        s"${ev.value} = graft.functions.FixedPointDot.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}

object FixedPointDot {
  /** True when any slot of the common prefix is NULL in either array —
    * the whole dot product is then NULL, exactly as the
    * `aggregate(zip_with(…))` HOF form propagates it (null·x → null,
    * acc + null → null). Without this, `ArrayData.getDouble` would read
    * a null slot as garbage/0 and silently diverge from the declarative
    * form (ADVICE r5). */
  def hasNullSlot(a: ArrayData, b: ArrayData): Boolean = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Static helper shared by interpreted eval and generated code.
    * Callers must pre-screen with [[hasNullSlot]]. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.floor(a.getDouble(i) * b.getDouble(i) * 1.0e12 + 0.5).toLong
      i += 1
    }
    acc
  }

  val info = new ExpressionInfo(classOf[FixedPointDot].getName, "fp_dot")

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"fp_dot expects exactly 2 arguments, got ${exprs.length}")
    FixedPointDot(exprs.head, exprs(1))
  }

  /** Runtime registration against an existing session (no restart);
    * idempotent — re-registration replaces the identical entry. */
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("fp_dot"), info, builder)
}
