package graft

import graft.shard.Key2Shard
import org.apache.spark.sql.functions._
import scala.util.Random

/** Shard-routing parity with the reference's `int(key[0]) % NShards`
  * over the Go string's raw UTF-8 bytes (reference:
  * src/shardkv/client.go:25-32). The driver's fixture keys are all
  * ASCII, so the multi-byte lead-byte path is exercised here: both
  * column spellings must agree with [[Key2Shard.shardOfRef]] (the
  * byte-for-byte JVM port of the Go function) on keys whose first
  * codepoint is 1, 2, 3 and 4 UTF-8 bytes wide.
  */
class Key2ShardSpec extends SparkSpec {
  import spark.implicits._

  // first-codepoint coverage: 1-byte ASCII, 2-byte Latin/Greek/Cyrillic/
  // Arabic, 3-byte Devanagari/CJK/Hangul/symbols, 4-byte emoji + math
  private val pool: IndexedSeq[String] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq(' ', '_', '-', '!', '~', ':'))
      .map(_.toString) ++
      Seq("é", "ß", "ñ", "Ω", "ж", "ا", "ह", "北", "京", "あ", "한", "€", "™",
        "😀", "🚀", "𝕏")

  test("shardOf and shardOfFast match the Go byte semantics on random UTF-8 keys") {
    val rnd = new Random(20260812L)
    val keys = ("" +: pool) ++ (1 to 500).map { _ =>
      (0 until (1 + rnd.nextInt(5))).map(_ => pool(rnd.nextInt(pool.size))).mkString
    }
    val rows = keys.distinct.toDF("key")
      .withColumn("s_builtin", Key2Shard.shardOf(col("key")))
      .withColumn("s_fast", Key2Shard.shardOfFast(spark, col("key")))
      .collect()
    assert(rows.length >= 400)
    rows.foreach { r =>
      val k = r.getString(0)
      val expected = Key2Shard.shardOfRef(k)
      assert(r.getInt(1) == expected,
        s"shardOf mismatch for '$k' (${k.codePoints().toArray.toSeq.map(c => f"U+$c%04X")})")
      assert(r.getInt(2) == expected,
        s"shardOfFast mismatch for '$k' (${k.codePoints().toArray.toSeq.map(c => f"U+$c%04X")})")
    }
  }

  test("empty key routes to shard 0 in every spelling") {
    assert(Key2Shard.shardOfRef("") == 0)
    val r = Seq("").toDF("key")
      .select(Key2Shard.shardOf(col("key")), Key2Shard.shardOfFast(spark, col("key")))
      .head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
  }

  test("null key routes to shard 0 in BOTH spellings — never null (silent row loss in filters)") {
    // shardOf already fell through when()'s null-as-false to shard 0;
    // shardOfFast used to null-propagate, so sink and filter paths
    // disagreed on where a null-keyed op lives
    val r = Seq((1, Option.empty[String])).toDF("id", "key")
      .select(Key2Shard.shardOf(col("key")), Key2Shard.shardOfFast(spark, col("key")))
      .head()
    assert(!r.isNullAt(0) && r.getInt(0) == 0, "shardOf(null) must be 0")
    assert(!r.isNullAt(1) && r.getInt(1) == 0, "shardOfFast(null) must be 0, not null")
  }
}
