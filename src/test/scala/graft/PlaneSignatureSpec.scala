package graft

import graft.functions.PlaneSignature
import org.apache.spark.sql.functions._

/** Pins [[graft.functions.PlaneSignature]] — the static-call LSH
  * signature expression (round 15) — against an independent Scala
  * reference of the published hyperplane formula, across both
  * evaluation paths. The expression replaced a posexplode+groupBy
  * aggregate AND a per-plane expression spelling (both had measured
  * 100×-rung cliffs, SURVEY §20.8), so its value semantics must be
  * pinned independently of any consumer's oracle. */
class PlaneSignatureSpec extends SparkSpec {

  /** The reference: component i of plane p is
    * ((i+1)·(p+3)·2654435761) % 2000001 − 1000000; bit = sign of the
    * dot. Written from the formula, not from the production code. */
  private def refSig(q: Array[Long], firstPlane: Int, numPlanes: Int): String =
    (0 until numPlanes).map { j =>
      val m = (firstPlane + j + 3).toLong
      val s = q.indices.map(i =>
        q(i) * (((i + 1L) * m * 2654435761L) % 2000001L - 1000000L)).sum
      if (s >= 0) "1" else "0"
    }.mkString

  test("plane_sig matches the formula reference across widths, offsets, and eval paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 64L).map(i =>
      (i, Array.fill(16)(rnd.nextInt(2000001).toLong - 1000000L)))
    val df = vecs.toDF("vec_id", "q")
    for ((first, n) <- Seq((0, 6), (6, 6), (0, 14), (84, 14), (0, 1))) {
      val got = df.select(col("vec_id"),
          PlaneSignature.planeSig(spark, col("q"), first, n).as("sig"))
        .as[(Long, String)].collect().toMap
      vecs.foreach { case (id, q) =>
        assert(got(id) == refSig(q, first, n),
          s"vec $id first=$first n=$n: ${got(id)} != ${refSig(q, first, n)}")
      }
      // the interpreted eval path (used by GenerateExec and codegen
      // fallback) must agree bit-for-bit with the codegen'd projection
      vecs.take(8).foreach { case (id, q) =>
        val expr = PlaneSignature(
          org.apache.spark.sql.catalyst.expressions.Literal.create(q,
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
          first, n)
        assert(expr.eval(null).toString == refSig(q, first, n),
          s"interpreted eval diverged for vec $id first=$first n=$n")
      }
    }
  }

  test("plane_sig null semantics: null array and null element both yield NULL") {
    import spark.implicits._
    val df = Seq((1L, Some(Array(1L, 2L, 3L))), (2L, None))
      .toDF("vec_id", "q")
      // inject a null ELEMENT via a transform that nulls index 1
      .withColumn("q_holed",
        when(col("vec_id") === 1, transform(col("q"),
          (x, i) => when(i === 1, lit(null)).otherwise(x))).otherwise(col("q")))
    val out = df.select(col("vec_id"),
        PlaneSignature.planeSig(spark, col("q_holed"), 0, 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L), "null element did not propagate to a NULL signature")
    assert(out(2L), "null array did not propagate to a NULL signature")
  }

  test("plane_sig empty-array semantics: NULL, never an all-'1' bucket magnet") {
    // r15 advice: an empty vector has sign-of-dot 0 against every
    // plane, so a non-null signature would collide all empty vectors
    // into one bucket; the posexplode spelling dropped them. Pin the
    // null on both eval paths.
    import spark.implicits._
    val df = Seq((1L, Array(1L, 2L)), (2L, Array.empty[Long])).toDF("vec_id", "q")
    val out = df.select(col("vec_id"),
        PlaneSignature.planeSig(spark, col("q"), 0, 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L), s"empty-array signature not NULL: $out")
    val expr = PlaneSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array.empty[Long],
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      0, 4)
    assert(expr.eval(null) == null, "interpreted eval of an empty array was non-null")
  }

  test("signature build stays a map-side projection: no aggregate, no exchange before the bucket join") {
    // the §20.8 regression guard: a reintroduced posexplode+groupBy
    // (or any exchange) in the signature stage would show up here
    val emb = Tables.embeddings(spark, sf0001)
    val sigs = pipeline.Similarity.lshFamilySignatures(emb, 2, 6)
    val plan = sigs.queryExecution.executedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(aggs.isEmpty, s"signature build reintroduced an aggregate:\n$plan")
    assert(exchanges.isEmpty, s"signature build reintroduced an exchange:\n$plan")
    // the §20.8 cliff-1 guard (r15 advice): GenerateExec evaluates its
    // generator INTERPRETED — an optimizer change collapsing the sig
    // projection into the family explode would reintroduce the
    // measured 11 s → 103 s cliff without moving aggregates or
    // exchanges. Pin that no PlaneSignature lives inside a generator:
    // the sigs must be computed in the codegen'd CHILD projection.
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.nonEmpty, s"family explode vanished from the plan:\n$plan")
    gens.foreach { g =>
      val sigInGen = g.generator.exists(_.isInstanceOf[graft.functions.PlaneSignature])
      assert(!sigInGen,
        s"plane_sig moved INSIDE the generator (interpreted eval cliff):\n$plan")
    }
    val sigInProjection = plan.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p }
      .flatMap(_.projectList)
      .exists(_.exists(_.isInstanceOf[graft.functions.PlaneSignature]))
    assert(sigInProjection,
      s"plane_sig not found in any codegen'd projection:\n$plan")
  }
}
