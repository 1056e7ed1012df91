package graft

import graft.functions.HammingDistance
import graft.kv.{KVEngine, OpLog}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hamming: native expression evaluates and registers for SQL") {
    HammingDistance.register(spark)
    val df = Seq(("0000", "0101"), ("1111", "1111"), ("10", "1010")).toDF("a", "b")
    val got = df.select(HammingDistance.hamming(spark, col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == Seq(2, 0, Int.MaxValue))
    val viaSql = spark.sql("SELECT hamming('abcd', 'abcf')").as[Int].head()
    assert(viaSql == 1)
    // null propagation
    val n = df.select(HammingDistance.hamming(spark, lit(null).cast("string"), col("b"))).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("dot_long: native expression matches the interpreted HOF spelling incl. null semantics") {
    import graft.functions.DotProductLong
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),          // 4+10+18 = 32
      (Seq(-1000000L, 1000000L), Seq(1000000L, 1000000L)), // large but exact
      (Seq.empty[Long], Seq.empty[Long]))           // empty -> 0
    val df = rows.toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (s, x) => s + x))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val native = df.select(DotProductLong.dotLong(spark, col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(native.toSeq == hof.toSeq && native(0) == 32L && native(2) == 0L)
    // unequal lengths: zip_with pads with null -> HOF yields null; the
    // native expression must agree
    val uneq = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    assert(uneq.select(DotProductLong.dotLong(spark, col("a"), col("b"))).head().isNullAt(0))
    assert(uneq.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (s, x) => s + x))
      .head().isNullAt(0))
    // null array -> null; SQL registration works
    assert(Seq((null.asInstanceOf[Seq[Long]], Seq(1L))).toDF("a", "b")
      .select(DotProductLong.dotLong(spark, col("a"), col("b"))).head().isNullAt(0))
    assert(spark.sql("SELECT dot_long(array(2L, 3L), array(4L, 5L))").as[Long].head() == 23L)
  }

  test("simhashNearPairs: exact collisions appear at dist 0, banding finds <=3-bit pairs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val docs = Seq(
      (1L, base.trim, "en", "s", 1L),
      (2L, base.trim, "en", "s", 1L), // identical -> dist 0
      (3L, (base + "iota").trim, "en", "s", 1L)) // near
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.simhashNearPairs(docs)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0)
    // every returned pair really is within 3 bits
    assert(pairs.values.forall(_ <= 3))
  }

  test("replaySalted == replay on the events oplog and on hot-key logs") {
    val ops = OpLog.fromEvents(Tables.events(spark, sf0001))
    val plain = KVEngine.replay(ops).as[(String, String)].collect().toMap
    val salted = KVEngine.replaySalted(ops, salt = 8).as[(String, String)].collect().toMap
    assert(salted == plain)

    // a pathological hot key: 90% of ops on one key, puts interleaved
    val rnd = new scala.util.Random(3)
    val hot = (0 until 2000).map { i =>
      val key = if (rnd.nextInt(10) < 9) "hot" else s"k${rnd.nextInt(5)}"
      val kind = if (rnd.nextInt(20) == 0) "put" else "append"
      graft.kv.Op(i.toLong, rnd.nextInt(3).toLong, i.toLong, kind, key, s"<$i>")
    }
    val p2 = KVEngine.replay(hot.toDS()).as[(String, String)].collect().toMap
    val s2 = KVEngine.replaySalted(hot.toDS(), salt = 16).as[(String, String)].collect().toMap
    assert(s2 == p2)
  }
}
