package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Hamming distance between two equal-length fingerprint strings
  * (e.g. the 32-bit SimHash fingerprints from pipeline.Dedup).
  *
  * A native Catalyst expression with doGenCode — stays inside
  * whole-stage codegen on the near-dup join's hot path, where a Scala
  * UDF would break the codegen span and pay serialization per row.
  * Unequal lengths yield Int.MaxValue (never "near").
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    HammingDistance.distance(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingDistance.distance($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HammingDistance {

  /** Byte-wise distance (fingerprints are ASCII '0'/'1' strings). */
  def distance(a: Array[Byte], b: Array[Byte]): Int = {
    if (a.length != b.length) return Int.MaxValue
    var i = 0
    var d = 0
    while (i < a.length) {
      if (a(i) != b(i)) d += 1
      i += 1
    }
    d
  }

  /** Column API: hamming(a, b). Registers on the column's session at
    * plan time via the public call_function route. */
  def hamming(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("hamming", a, b)
  }

  /** Register as SQL function `hamming` on an existing session
    * (idempotent). Sessions built by the user can instead inject it
    * via [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("hamming")))
      registry.createOrReplaceTempFunction(
        "hamming", exprs => HammingDistance(exprs(0), exprs(1)), "scala_udf")
  }
}
