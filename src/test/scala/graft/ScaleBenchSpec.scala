package graft

import graft.tools.ScaleBench
import org.apache.spark.sql.functions._

/** Pins the properties SCALE_r12.json's validity rests on: the
  * replicated corpus must scale the WORKLOAD linearly — k× the rows
  * with the within-replica structure preserved and NO cross-replica
  * similarity — or the measured exponents would be artifacts of the
  * generator, not of the operators (a naive k-way union hands every
  * doc k−1 exact dups and makes pair counts quadratic BY
  * CONSTRUCTION; see the ScaleBench scaladoc). */
class ScaleBenchSpec extends SparkSpec {

  test("scale replicas: disjoint shingle domains, preserved structure, lockstep ids") {
    val root = java.nio.file.Files.createTempDirectory("graft_scale_spec_")
    try {
      ScaleBench.generate(spark, sf0001, root, 3)

      // --- documents: exactly 3x rows, ids disjoint ---
      val base = spark.read.parquet(s"$sf0001/documents.parquet")
      val rep = spark.read.parquet(root.resolve("documents.parquet").toString)
      val nBase = base.count()
      assert(rep.count() == 3 * nBase, "doc rows must scale exactly 3x")
      assert(rep.select("doc_id").distinct().count() == 3 * nBase,
        "replica doc ids must be disjoint")

      // replica 0 is byte-verbatim
      val r0 = rep.filter(col("doc_id") < 10000000L)
      assert(r0.exceptAll(base).count() == 0 && base.exceptAll(r0).count() == 0,
        "replica 0 must be the verbatim base")

      // --- no cross-replica shingle collisions: the whole point ---
      // (token suffixing makes every k-shingle replica-local, so LSH /
      // jaccard candidate pairs can never span replicas)
      val sh = graft.pipeline.TextAnalysis.shingles(rep, 3)
        .select((col("doc_id") / 10000000L).cast("long").as("r"), col("shingle"))
      val cross = sh.groupBy("shingle").agg(countDistinct("r").as("nr"))
        .filter(col("nr") > 1).count()
      assert(cross == 0, s"$cross shingles collide across replicas")

      // within-replica duplicate structure preserved: the exact-dup
      // pair count of each replica equals the base's
      def exactPairs(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy("text").agg(count(lit(1)).as("n"))
          .select(sum(expr("n * (n - 1) div 2"))).head().getLong(0)
      val basePairs = exactPairs(base)
      (0 until 3).foreach { r =>
        val rp = exactPairs(rep.filter(col("doc_id") >= r * 10000000L &&
          col("doc_id") < (r + 1) * 10000000L))
        assert(rp == basePairs, s"replica $r exact-dup pairs $rp != base $basePairs")
      }

      // --- embeddings: rotation preserves norms exactly, ids lockstep ---
      val e0 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      val er = spark.read.parquet(root.resolve("embeddings.parquet").toString)
      assert(er.count() == 3 * e0.count(), "embedding rows must scale exactly 3x")
      val norm = aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      val baseNorms = e0.select(col("vec_id"), round(norm, 4).as("n2"))
      val repNorms = er.select((col("vec_id") % 10000000L).as("vec_id"),
        round(norm, 4).as("n2")).distinct()
      // every replica's vector has the base vector's exact norm
      assert(repNorms.exceptAll(baseNorms).count() == 0,
        "rotation changed a vector norm")
      // lockstep shift: doc 1's replica-2 twin pairs with vec 1's
      assert(er.filter(col("vec_id") === 2L * 10000000L + 1L).count() == 1)
      // gen=v3 sign flips actually applied: a replica twin must NOT be
      // the bare rotation of its base vector (rotation alone leaves
      // mean-dominated cross-replica cosines near mu^2/E[x^2] — the
      // quadratic verified-pair creep — and wraps to IDENTITY at
      // r >= dim). Sign-scrambled twin dot / norm stays far from 1.
      val b1 = e0.filter(col("vec_id") === 1L)
        .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
      val t1 = er.filter(col("vec_id") === 10000001L)
        .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
      val rot1 = b1.drop(1) ++ b1.take(1)
      val twinCos = rot1.zip(t1).map { case (a, b) => a * b }.sum /
        math.max(1e-12, b1.map(x => x * x).sum)
      assert(math.abs(math.abs(twinCos) - 1.0) > 0.05,
        s"replica twin is (+-) the bare rotation — sign pattern not applied (cos=$twinCos)")

      // --- events: 3x rows, same time horizon, disjoint users ---
      val ev0 = spark.read.parquet(s"$sf0001/events.parquet")
      val evr = spark.read.parquet(root.resolve("events.parquet").toString)
      assert(evr.count() == 3 * ev0.count())
      val h0 = ev0.agg(min("ts"), max("ts")).head()
      val hr = evr.agg(min("ts"), max("ts")).head()
      assert(h0 == hr, "replication must keep the time horizon (10x traffic, not 10x time)")
      assert(evr.select("user_id").distinct().count() ==
        3 * ev0.select("user_id").distinct().count(),
        "replica user domains must be disjoint")
    } finally graft.core.Fs.rmTreeNoFollow(root)
  }

  test("relational replicas: k× facts over verbatim dims, order/customer lockstep") {
    val root = java.nio.file.Files.createTempDirectory("graft_scale_rel_spec_")
    try {
      ScaleBench.generate(spark, sf0001, root, 3)
      val S = 10000000L

      val ordB = spark.read.parquet(s"$sf0001/orders.parquet")
      val ordR = spark.read.parquet(root.resolve("orders.parquet").toString)
      val liB = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val liR = spark.read.parquet(root.resolve("lineitem.parquet").toString)
      val cB = spark.read.parquet(s"$sf0001/customer.parquet")
      val cR = spark.read.parquet(root.resolve("customer.parquet").toString)
      assert(ordR.count() == 3 * ordB.count(), "orders must scale exactly 3x")
      assert(liR.count() == 3 * liB.count(), "lineitem must scale exactly 3x")
      assert(cR.count() == 3 * cB.count(), "customer must scale exactly 3x")

      // dims stay verbatim — k× the facts per dimension key
      val supB = spark.read.parquet(s"$sf0001/supplier.parquet")
      val supR = spark.read.parquet(root.resolve("supplier.parquet").toString)
      assert(supR.exceptAll(supB).count() == 0 && supB.exceptAll(supR).count() == 0,
        "supplier dim must be byte-verbatim")

      // lockstep: every order's lineitem GROUP replicates exactly —
      // per-order quantity sums (q18's HAVING input) are preserved
      val qtyB = liB.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
          count(lit(1)).as("n"))
      val qtyR = liR.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
          count(lit(1)).as("n"))
        .withColumn("l_orderkey", col("l_orderkey") % S)
      assert(qtyR.exceptAll(
          qtyB.unionByName(qtyB).unionByName(qtyB)).count() == 0,
        "a replica's per-order lineitem group diverged from the base")

      // every replica order's customer exists (custkey shifts in
      // lockstep with orderkeys), so join fan-outs are preserved
      val orphans = ordR.join(cR, ordR("o_custkey") === cR("c_custkey"), "left_anti").count()
      assert(orphans == 0, s"$orphans replica orders lost their customer")
    } finally graft.core.Fs.rmTreeNoFollow(root)
  }

  test("generate fails loudly when base ids would overlap the replica shift") {
    // a base corpus with doc_id >= 10^7 would make replica id domains
    // overlap and silently corrupt every fitted exponent (advice r12)
    val bad = java.nio.file.Files.createTempDirectory("graft_scale_badbase_")
    val out = java.nio.file.Files.createTempDirectory("graft_scale_badout_")
    try {
      spark.read.parquet(s"$sf0001/documents.parquet")
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .write.parquet(bad.resolve("documents.parquet").toString)
      val e = intercept[IllegalArgumentException] {
        ScaleBench.generate(spark, bad.toString, out, 2)
      }
      assert(e.getMessage.contains("overlap"), s"wrong failure: ${e.getMessage}")
    } finally {
      graft.core.Fs.rmTreeNoFollow(bad); graft.core.Fs.rmTreeNoFollow(out)
    }
  }
}
