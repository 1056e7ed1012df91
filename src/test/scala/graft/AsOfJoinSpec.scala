package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right row at or before left time, per key") {
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 35L, 99.0),
      ("B", 15L, 50.0), ("B", 16L, 51.0))
      .toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 16L, 7.0), ("C", 1L, 9.0))
      .toDF("sym", "t", "bid")

    val got = AsOfJoin.join(trades, quotes, "sym", "t", "t", Seq("bid"))
      .select("sym", "t", "px", "asof_bid")
      .as[(String, Long, Double, Option[Double])]
      .collect().toSet

    assert(got == Set(
      ("A", 10L, 100.0, Some(1.0)),
      ("A", 20L, 101.0, Some(2.0)), // tie: right row at same time wins
      ("A", 35L, 99.0, Some(3.0)),
      ("B", 15L, 50.0, None), // no quote yet
      ("B", 16L, 51.0, Some(7.0))))
  }

  test("null payload values in the latest right row are NOT back-filled from older rows") {
    val left = Seq(("A", 25L)).toDF("k", "t")
    val right = Seq(
      ("A", 10L, Option(5.0), Option.empty[Double]),
      ("A", 20L, Option.empty[Double], Option(7.0)))
      .toDF("k", "t", "bid", "ask")
    val got = AsOfJoin.join(left, right, "k", "t", "t", Seq("bid", "ask"))
      .select("asof_bid", "asof_ask")
      .as[(Option[Double], Option[Double])].head()
    // the t=20 row wins wholesale: bid is genuinely null there
    assert(got == (None, Some(7.0)))
  }

  test("asof join matches a naive per-row implementation on random data") {
    val rnd = new scala.util.Random(11)
    val lt = (0 until 300).map(_ => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextInt(100)))
    val rt = (0 until 200).map(_ => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextInt(100)))
    val expected = lt.map { case (k, t, v) =>
      val best = rt.filter(r => r._1 == k && r._2 <= t).sortBy(r => (r._2, r._3)).lastOption
      // naive tie-break: among equal times take max payload? our op takes
      // the LAST in (time, side) order with unspecified intra-time right
      // order — dedupe right times to keep the comparison well-defined
      (k, t, v)
    }
    val rtDeduped = rt.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val exp = lt.map { case (k, t, v) =>
      val best = rtDeduped.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
      ((k, t, v), best.map(_._3))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.head._2 }

    val got = AsOfJoin.join(
      lt.toDF("k", "t", "v"), rtDeduped.toDF("k", "t", "p"), "k", "t", "t", Seq("p"))
      .as[(String, Long, Int, Option[Int])]
      .collect()
      .map(r => ((r._1, r._2, r._3), r._4)).toMap
    exp.foreach { case (key, e) =>
      assert(got(key) == e, s"row $key: got ${got(key)}, expected $e")
    }
  }
}
