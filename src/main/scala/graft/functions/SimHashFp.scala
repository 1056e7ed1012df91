package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash fingerprint of a token array: 32-char '0'/'1' string, bit j
  * set iff the tf-weighted majority of md5(token) hex digit j has its
  * high bit set.
  *
  * Semantically identical to the built-in composition
  *   aggregate(transform(toks, md5), zeros, zip_with(+/-1)) -> bits
  * but those higher-order lambdas evaluate interpreted per element;
  * this expression runs one tight MD5+accumulate pass per row and
  * stays inside whole-stage codegen (the (b) tier of SURVEY's
  * custom-operator preference order).
  */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(arr: Any): Any =
    SimHashFp.fingerprint(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHashFp.fingerprint($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashFp {

  private val digest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** One pass: per token, md5 -> 32 nibbles; weight +1 if nibble high
    * bit set else -1; threshold at >= 0. Iterating every occurrence IS
    * the tf-weighting. */
  def fingerprint(tokens: ArrayData): UTF8String = {
    val w = new Array[Int](32)
    val md = digest.get()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val h = md.digest(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < 16) {
          val b = h(j) & 0xff
          // high nibble then low nibble; hex digit >= '8' == high bit set
          if ((b & 0x80) != 0) w(2 * j) += 1 else w(2 * j) -= 1
          if ((b & 0x08) != 0) w(2 * j + 1) += 1 else w(2 * j + 1) -= 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var k = 0
    while (k < 32) {
      out(k) = if (w(k) >= 0) '1'.toByte else '0'.toByte
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  def simhashFp(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("simhash_fp", tokens)
  }

  /** Idempotent: a session that already has the function (via a prior
    * call or [[graft.GraftExtensions]]) is left untouched — repeated
    * createOrReplaceTempFunction would spam "replaced a previously
    * registered function" warnings on every plan build. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_fp")))
      registry.createOrReplaceTempFunction(
        "simhash_fp", exprs => SimHashFp(exprs.head), "scala_udf")
  }
}
