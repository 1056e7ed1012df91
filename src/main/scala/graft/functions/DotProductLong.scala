package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two array<long> columns — the inner
  * loop of every similarity operator (brute-force top-k, LSH verify,
  * IVF assignment and probing, k-means).
  *
  * Exists because the built-in spelling
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` evaluates its lambdas
  * INTERPRETED in Spark 4.1 (higher-order functions have no codegen),
  * costing an allocation-heavy closure call per element; this native
  * expression is one tight codegen'd loop (custom-operator tier (b),
  * SURVEY §4).
  *
  * Semantics match the HOF spelling EXACTLY so the swap is
  * plan-only: a null array, a null element, or unequal lengths
  * (zip_with pads with null, and long * null propagates through the
  * aggregate) all yield NULL.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotProductLong {

  /** Column API: dot_long(a, b). Registers on the session at plan
    * time via the public call_function route (idempotent). */
  def dotLong(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("dot_long", a, b)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dot_long")))
      registry.createOrReplaceTempFunction(
        "dot_long", exprs => DotProductLong(exprs(0), exprs(1)), "scala_udf")
  }
}
