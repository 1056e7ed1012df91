package graft.shard

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's shard routing function — first byte of the key
  * mod NShards (reference: src/shardkv/client.go:25-32,
  * src/shardmaster/common.go:24). Unlike the batch hash partitioner,
  * this IS observable behavior (shardkv tests kill one group and
  * assert exactly which keys go unavailable), so it is implemented
  * literally rather than with Spark's murmur3.
  *
  * Composed from built-in expressions (codegen'd); no custom Catalyst
  * Expression needed (SURVEY §4).
  */
object Key2Shard {
  val NShards = 10

  def shardOf(key: Column): Column =
    when(length(key) > 0, ascii(substring(key, 1, 1)) % NShards).otherwise(lit(0))

  /** DuckDB spelling of the same expression, for oracle SQL. */
  def shardOfSql(key: String): String =
    s"CASE WHEN length($key) > 0 THEN ascii(substring($key, 1, 1)) % $NShards ELSE 0 END"
}
