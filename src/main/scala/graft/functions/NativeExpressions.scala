package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector hot path.
  *
  * [[DotI64]] is the per-pair scoring kernel: an integer dot product
  * over two `array<long>` columns as a tight codegen'd loop
  * (`getLong` directly off the unsafe array data — no lambda
  * dispatch, no boxing). Preference order from the build brief:
  * compose built-ins where semantics allow, native `Expression` with
  * `doGenCode` where the built-ins leave interpreted HOF dispatch in
  * a loop that runs millions of times per stage — which is exactly
  * the candidate-verify dot product.
  */
case class DotI64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i64 needs two array<bigint> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long acc = 0L;
         |for (int i = 0; i < n; i++) {
         |  acc += $a.getLong(i) * $b.getLong(i);
         |}
         |${ev.value} = acc;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeExpressions {

  private val dotId = FunctionIdentifier("dot_i64")
  private val dotInfo = new ExpressionInfo(classOf[DotI64].getName, "dot_i64")
  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "dot_i64 takes exactly 2 arguments")
    DotI64(children.head, children(1))
  }

  /** Register the native functions on a live session (idempotent) so
    * they are callable via `call_function` / SQL by name. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(dotId))
      registry.registerFunction(dotId, dotInfo, dotBuilder)
  }

  private[functions] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((dotId, dotInfo, dotBuilder))
}

/** Session-extensions entry point: sessions built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (a STATIC
  * conf — set it before the first session of the application) or
  * `builder.withExtensions(new GraftExtensions)` get every graft
  * native function injected at session construction — the deployment
  * path for a cluster where user SQL should see `dot_i64` without any
  * driver-side registration call. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    NativeExpressions.inject(ext)
}
