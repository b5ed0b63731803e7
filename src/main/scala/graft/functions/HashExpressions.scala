package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling string hash
  * (fold (acc*31 + codepoint) mod P over code points — the same definition
  * as [[TextHash.polyHash]] / [[TextHash.polyHashSql]]).
  *
  * The composable formulation (`aggregate(transform(split(s, "")...))`)
  * allocates a per-character string array and dispatches a lambda per
  * character; this expression is a tight codegen'd loop — ~40× less work per
  * value, which dominates the minhash/simhash/fingerprint pipelines. Code
  * points (not UTF-16 units) keep it identical to DuckDB's `unicode(c)` for
  * all of Unicode. */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % TextHash.P
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $input.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % ${TextHash.P}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  val FnName = "poly_hash"

  /** Idempotently register `poly_hash` in this session's function registry. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => PolyHash(exprs.head), "scala_udf")
  }

  /** Codegen'd polynomial string hash (see [[PolyHash]]); requires
    * [[register]] on the session. */
  def polyHash(c: Column): Column = call_function(FnName, c)
}
