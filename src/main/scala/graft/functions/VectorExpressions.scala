package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The composable `aggregate(zip_with(...))` formulation is semantically
  * identical but runs as an interpreted HigherOrderFunction — per-element
  * lambda dispatch plus an intermediate array per row. This expression
  * participates in whole-stage codegen: the generated Java is a tight
  * primitive loop over the two float arrays (no allocation, no virtual
  * calls), which matters when a similarity join evaluates it millions of
  * times. Accumulation order is the same sequential left-to-right sum as
  * the DuckDB oracle fragment ([[TextHash.dotSql]]), so results are
  * bit-identical across engines.
  *
  * PRECONDITION: array elements are non-null (embedding columns are dense
  * float vectors). A null element would read as an undefined value here
  * while the SQL fragment propagates NULL — enforce density upstream.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  val FnName = "float_vector_dot"

  /** Idempotently register the expression in this session's function
    * registry (temp function — visible to DataFrame and SQL callers). */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => FloatVectorDot(exprs.head, exprs(1)), "scala_udf")
  }

  /** Codegen'd dot product of two `array<float>` columns (see class doc).
    * Requires [[register]] to have been called on the session. */
  def floatDot(a: Column, b: Column): Column = call_function(FnName, a, b)
}
