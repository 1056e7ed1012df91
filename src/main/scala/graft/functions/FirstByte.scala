package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** First UTF-8 byte of a string as an unsigned int (0 for the empty
  * string) — the numeric core of the reference's shard router
  * (reference: src/shardkv/client.go:25-32 `int(key[0])` reads the Go
  * string's raw bytes).
  *
  * Exists because the built-in spelling
  * `conv(hex(substring(cast(k AS BINARY), 1, 1)), 16, 10)` builds
  * three intermediate strings per row on every shard-routing path; a
  * native expression reads one byte with zero allocation and stays
  * inside whole-stage codegen (custom-operator tier (b), SURVEY §4).
  */
case class FirstByte(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(s: Any): Any =
    FirstByte.firstByte(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $s.numBytes() == 0 ? 0 : ($s.getByte(0) & 0xff);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object FirstByte {

  def firstByte(s: UTF8String): Int =
    if (s.numBytes() == 0) 0 else s.getByte(0) & 0xff

  /** Column API; registers on `spark` then resolves by name. */
  def firstByte(spark: SparkSession, key: Column): Column = {
    register(spark)
    call_function("first_byte", key)
  }

  /** Idempotent per-session registration (see [[SimHashFp.register]]). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("first_byte")))
      registry.createOrReplaceTempFunction(
        "first_byte", exprs => FirstByte(exprs.head), "scala_udf")
  }
}
