package graft

/** Dev tool: print formatted physical plans for selected queries so
  * pushdown / broadcast / codegen can be inspected (SURVEY §4 stance:
  * iterate until the plan is the one you'd want, not the first one
  * that passed).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q6_filter", "q3_join", "q5_join", "wc_wordcount", "kv_state")
    val spark = Tables.session("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    // the scoped-conf TPC-H entries snapshot their LIMIT-100 result (a
    // LocalRelation plan); these aliases expose the underlying SQL
    // builders so the computation's plan stays inspectable (r17).
    // The REGISTRY is consulted first (r17 advice): a future declared
    // query named like an alias must win, never be silently shadowed.
    val extra: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "q18_sql" -> ((s, d) => graft.apps.RelationalQueries.q18Sql(s, d)),
      "q21_sql" -> ((s, d) => graft.apps.RelationalQueries.q21Sql(s, d)))
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries.get(n).map(_(spark, sfDir))
        .orElse(extra.get(n).map(_(spark, sfDir)))
        .getOrElse(sys.error(s"unknown query: $n"))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_RUN")) {
        // execute THIS queryExecution (count() would plan a new one) so
        // AQE finalizes: stage reuse and runtime join selections only
        // appear in the final adaptive plan
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
