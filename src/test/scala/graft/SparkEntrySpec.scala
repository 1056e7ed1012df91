package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the correctness gate only checks queries
  * that have BOTH a `queries` entry and an `oracleSql` entry — a
  * silently missing oracle downgrades an operator to a rows-only
  * check without anyone noticing.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every declared query has a DuckDB oracle; every oracle has a query") {
    // queries that are deliberately rows-only go here, with a reason
    val rowsOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without an oracle: ${missing.mkString(", ")}")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: ${orphaned.mkString(", ")}")
  }

  test("query names are unique across packs") {
    // SparkEntry.queries itself require()s this; calling it here turns
    // a future collision into a test failure instead of a driver crash
    assert(SparkEntry.queries.size >= 47)
  }
}
