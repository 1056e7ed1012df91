package graft.shard

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's shard routing function — first BYTE of the key
  * mod NShards (reference: src/shardkv/client.go:25-32 `int(key[0])`
  * indexes the Go string's raw UTF-8 bytes; src/shardmaster/common
  * .go:24). Unlike the batch hash partitioner, this IS observable
  * behavior (shardkv tests kill one group and assert exactly which
  * keys go unavailable), so it is implemented literally rather than
  * with Spark's murmur3.
  *
  * Byte, not character: for a key starting with 'é' Go sees UTF-8
  * lead byte 0xC3 = 195 -> shard 5, while the first *codepoint* is
  * U+00E9 = 233 -> shard 3. We read the first byte of the UTF-8
  * encoding via cast-to-binary so non-ASCII keys route identically.
  *
  * Composed from built-in expressions (codegen'd); no custom Catalyst
  * Expression needed (SURVEY §4).
  */
object Key2Shard {
  val NShards = 10

  /** Registration-free spelling from built-ins only — correct
    * anywhere, but builds three intermediate strings per row. Prefer
    * [[shardOfFast]] on hot paths when a session handle is available. */
  def shardOf(key: Column): Column =
    when(length(key) > 0,
      conv(hex(substring(key.cast("binary"), 1, 1)), 16, 10).cast("int") % NShards)
      .otherwise(lit(0))

  /** Zero-allocation routing via the native codegen'd
    * [[graft.functions.FirstByte]] expression — same semantics as
    * [[shardOf]] (property-tested against [[shardOfRef]]), INCLUDING
    * null keys: FirstByte null-propagates, so without the coalesce a
    * null-keyed op would route to shard 0 on the sink path (shardOf)
    * but vanish from filter/join paths (null comparison) — a silent
    * row loss instead of a routing decision. */
  def shardOfFast(spark: org.apache.spark.sql.SparkSession, key: Column): Column =
    coalesce(graft.functions.FirstByte.firstByte(spark, key) % NShards, lit(0))

  /** JVM reference implementation — byte-for-byte the Go function,
    * used by tests as the parity oracle. */
  def shardOfRef(key: String): Int =
    if (key.isEmpty) 0
    else (key.getBytes(java.nio.charset.StandardCharsets.UTF_8)(0) & 0xff) % NShards

  /** DuckDB spelling of the same expression, for oracle SQL: the
    * first byte's value read off the first two hex digits of the
    * UTF-8 encoding. */
  def shardOfSql(key: String): String = {
    def nib(i: Int) =
      s"(strpos('0123456789ABCDEF', substring(hex(CAST($key AS BLOB)), $i, 1)) - 1)"
    s"CASE WHEN length($key) > 0 THEN (${nib(1)} * 16 + ${nib(2)}) % $NShards ELSE 0 END"
  }
}
