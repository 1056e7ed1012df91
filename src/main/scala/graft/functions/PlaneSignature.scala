package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One LSH FAMILY's sign-of-dot signature ("1"/"0" per plane) of an
  * array<long> vector against `numPlanes` pseudo-random hyperplanes
  * starting at global plane index `firstPlane`. The planes are never
  * materialized: component i of plane p is the integer formula
  * `((i+1) * (p+3) * 2654435761) % 2000001 − 1000000`
  * (keep in sync with the SQL spelling in the oracle CTEs).
  *
  * Shaped by two measured cliffs at the 100× rung (600k vectors,
  * 112 planes — SCALE_r15 probes):
  *
  *  - the signature build used to posexplode every vector into a row
  *    PER DIMENSION and sum plane dots under a groupBy(vec_id) — 64×
  *    the rows, each dragging the full q array through a hash
  *    aggregate whose sort-fallback spilled 4.3 GB on a query whose
  *    total shuffle is 178 MB;
  *  - replacing that with per-plane dot EXPRESSIONS hit a second,
  *    sneakier cliff: inside whole-stage codegen the per-row inputs
  *    are local variables, so Spark cannot split expression code into
  *    sub-methods — 40-90 inline dot loops compile into one method
  *    past the JVM's ~8 KB JIT limit and the hot path silently drops
  *    to BYTECODE INTERPRETATION (measured 30-60 s for the projection
  *    alone, non-monotone in width: ≥115 output fields disabled
  *    whole-stage codegen entirely, whose row-based fallback CAN
  *    split, and ran 40× faster than the "optimized" path).
  *
  * One expression per FAMILY whose generated code is a single static
  * call to [[PlaneSignature.sig]] keeps the inline footprint a few
  * dozen bytes at ANY family count, and the helper itself is a plain
  * monomorphic JVM method the JIT always compiles (custom-operator
  * tier (b), SURVEY §4 — same reasoning as [[DotProductLong]]).
  *
  * Null semantics: null array, null element, or EMPTY array → NULL
  * signature (embeddings are non-null and non-empty by schema; an
  * empty vector has sign-of-dot 0 against every plane, so an all-'1'
  * signature would collide every empty vector into one bucket — the
  * posexplode spelling this expression replaced dropped empties
  * instead, and null preserves that "no signature" semantics).
  */
case class PlaneSignature(child: Expression, firstPlane: Int, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    PlaneSignature.sig(v.asInstanceOf[ArrayData], firstPlane, numPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.PlaneSignature.sig($a, $firstPlane, $numPlanes);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PlaneSignature {

  /** The signature loop — static and expression-free so the generated
    * call site stays tiny and the JIT owns the hot path. Returns null
    * on a null element or an empty array (propagated to a NULL
    * signature — see the class doc's empty-vector rationale). */
  def sig(a: ArrayData, firstPlane: Int, numPlanes: Int): UTF8String = {
    val dims = a.numElements()
    if (dims == 0) return null
    val bytes = new Array[Byte](numPlanes)
    var j = 0
    while (j < numPlanes) {
      val m = (firstPlane + j + 3).toLong
      var s = 0L
      var i = 0
      while (i < dims) {
        if (a.isNullAt(i)) return null
        s += a.getLong(i) * (((i + 1L) * m * 2654435761L) % 2000001L - 1000000L)
        i += 1
      }
      bytes(j) = if (s >= 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(bytes)
  }

  /** Column API: plane_sig(q, firstPlane, numPlanes). Registers on
    * the session at plan time via the public call_function route
    * (idempotent). */
  def planeSig(spark: SparkSession, q: Column, firstPlane: Int, numPlanes: Int): Column = {
    register(spark)
    call_function("plane_sig", q, lit(firstPlane), lit(numPlanes))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("plane_sig")))
      registry.createOrReplaceTempFunction(
        "plane_sig",
        exprs => PlaneSignature(exprs(0),
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int]),
        "scala_udf")
  }
}
