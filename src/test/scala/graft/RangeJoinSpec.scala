package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Banded range join: equi-join semantics must equal the naive
  * theta-join on every bucket relationship — same bucket, adjacent
  * buckets, exact boundary, and the key fence.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // window in "µs" for the test

  private def pairs(rows: (String, Long)*): Set[(Long, Long)] = {
    val e = rows.zipWithIndex
      .map { case ((k, t), i) => (k, i.toLong, t) }
    val a = e.toDF("key", "id_a", "t_a")
    val b = e.toDF("key", "id_b", "t_b")
    RangeJoin.join(a, b, "key", "t_a", "t_b", W)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("same-bucket, adjacent-bucket and boundary pairs are all found exactly once") {
    val got = pairs(
      ("u", 10L),   // 0: bucket 0
      ("u", 90L),   // 1: bucket 0 — same-bucket pair with 0 (Δ80)
      ("u", 110L),  // 2: bucket 1 — adjacent-bucket pair with 1 (Δ20), with 0 (Δ100 == W, boundary IN)
      ("u", 250L),  // 3: bucket 2 — Δ140 from 2: OUT; Δ160 from 1: OUT
      ("u", 350L),  // 4: bucket 3 — Δ100 from 3: boundary IN
      ("v", 15L))   // 5: other key — never pairs with u's rows
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)), got.toString)
  }

  test("cross-key rows never pair; duplicate timestamps pair once") {
    val got = pairs(("u", 50L), ("v", 50L), ("u", 50L))
    assert(got == Set((0L, 2L)), got.toString)
  }

  test("negative and zero-straddling times: matches the naive theta-join") {
    // bucket = trunc-toward-zero division, so bucket 0 spans (-W, W) —
    // 2W-1 integers. Adjacency still holds (every bucket holds >= W
    // integers, so a W-window can't skip a whole bucket); this pins it
    // across the sign boundary where floor and trunc diverge.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(i =>
      (s"k${rnd.nextInt(4)}", i.toLong, (rnd.nextInt(2000) - 1000).toLong))
    val a = rows.toDF("key", "id_a", "t_a")
    val b = rows.toDF("key", "id_b", "t_b")
    val banded = RangeJoin.join(a, b, "key", "t_a", "t_b", W)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = (for {
      (k1, i1, t1) <- rows; (k2, i2, t2) <- rows
      if k1 == k2 && i1 < i2 && math.abs(t2 - t1) <= W
    } yield (i1, i2)).toSet
    assert(banded == naive,
      s"missing: ${naive -- banded}, extra: ${banded -- naive}")
  }

  test("inputs already carrying __bucket are rejected loudly") {
    val a = Seq(("u", 1L, 10L, 0L)).toDF("key", "id_a", "t_a", "__bucket")
    val b = Seq(("u", 2L, 20L)).toDF("key", "id_b", "t_b")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.join(a, b, "key", "t_a", "t_b", W)
    }
    assert(e.getMessage.contains("__bucket"))
  }

  test("matches the naive theta-join on a random stream") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map(i =>
      (s"k${rnd.nextInt(5)}", i.toLong, rnd.nextInt(2000).toLong))
    val a = rows.toDF("key", "id_a", "t_a")
    val b = rows.map { case (k, i, t) => (k, i, t) }.toDF("key", "id_b", "t_b")
    val banded = RangeJoin.join(a, b, "key", "t_a", "t_b", W)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = (for {
      (k1, i1, t1) <- rows; (k2, i2, t2) <- rows
      if k1 == k2 && i1 < i2 && math.abs(t2 - t1) <= W
    } yield (i1, i2)).toSet
    assert(banded == naive,
      s"missing: ${naive -- banded}, extra: ${banded -- naive}")
  }
}
