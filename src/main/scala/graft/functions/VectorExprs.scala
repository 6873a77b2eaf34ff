package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector-math hot path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) runs interpreted — lambda
  * dispatch and boxing per element — and dominated the embedding near-dup
  * runtime (measured ~23 s for ~500k candidate pairs × 64 dims). This
  * BinaryExpression generates a tight primitive loop inside whole-stage
  * codegen (SURVEY §7.3 escalation path (b): a custom `Expression` where
  * the built-in operators genuinely can't express the computation
  * efficiently). */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float>/array<double> inputs, got ${l.sql} / ${r.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemIsFloat(left)) s"$a.getFloat(i)" else s"$a.getDouble(i)"
      val rGet = if (elemIsFloat(right)) s"$b.getFloat(i)" else s"$b.getDouble(i)"
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  if (!$a.isNullAt(i) && !$b.isNullAt(i)) {
         |    acc += ((double) $lGet) * ((double) $rGet);
         |  }
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Codegen'd dot product of two float/double array columns. Resolved via
    * the `vec_dot` function registered by [[GraftExtensions]] — sessions
    * must set `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm via the codegen'd self-dot. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero vectors (never NaN/div-by-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }
}

/** SparkSessionExtensions entry point registering graft's native
  * expressions (`spark.sql.extensions=graft.functions.GraftExtensions`).
  * SQL surface: `SELECT vec_dot(a, b)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"vec_dot takes 2 arguments, got ${children.length}")
        VectorDot(children.head, children(1))
      }))
  }
}
