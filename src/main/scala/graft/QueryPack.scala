package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Each entry in [[queries]] is a full Spark plan over the TESTDATA
  * tables; each entry in [[oracleSql]] is the equivalent DuckDB SQL the
  * driver runs over the same parquet files. Contract (builder prompt):
  * column NAMES and VALUES must match — the driver sorts columns by
  * name and hash-compares. Queries with no SQL-expressible oracle are
  * simply absent from [[oracleSql]] (driver falls back to a rows-only
  * check).
  *
  * Parity rules used throughout:
  *  - every query ends in a deterministic ORDER BY over a unique key;
  *  - double aggregates are rounded on BOTH sides (Spark + DuckDB
  *    compute IEEE doubles in different orders — raw sums differ in
  *    ULPs);
  *  - only portable hash functions (md5) appear in oracle-checked
  *    queries — Spark murmur3/xxhash64 don't exist in DuckDB.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
