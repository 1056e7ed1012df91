package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the similarity graphs the dedup plane already
  * builds — the reference's shard/rebalance layer treats ownership as
  * a graph problem (src/shardmaster/server.go: move shards toward the
  * balance fixpoint); here the corpus-scale counterpart is centrality
  * over the document-similarity graph: which docs sit at the center
  * of a near-dup neighborhood (keep one, score the rest down) vs
  * dangling singletons.
  */
object Graph {

  /** Scale used to carry PageRank mass as exact integers: one unit of
    * rank = 1e-9. */
  val PrBase = 1000000000L

  /** PageRank over a directed edge list, `iters` synchronous
    * iterations, damping 0.85 — the canonical iterative-fixpoint
    * workload (same loop shape as [[Dedup.components]], but value
    * propagation instead of label contraction).
    *
    * All mass arithmetic is INTEGER (1e-9 units, [[PrBase]]): each
    * doc's rank divides among its out-edges by floor division, the
    * damped update is `(15% of base)/N + (85 * inflow)/100` in longs
    * — so DuckDB replays every iteration bit-for-bit (the k-means
    * quantization contract; float PageRank would diverge across
    * engines in the sum order). The floored remainders and
    * dangling-node outflow are DROPPED, not redistributed — total
    * mass shrinks toward the teleport floor; ranking is unaffected
    * (every node loses proportionally) and the variant stays exactly
    * replayable. Nodes with no in-edges hold the teleport term.
    *
    * Scale shape: per iteration, one equi-join of the edge list with
    * the rank table on src and one partial-aggregating groupBy on
    * dst — the classic distributed PageRank step, both keyed
    * shuffles AQE-planned; the node table joins back `left` so
    * isolated nodes never leave the result. `iters` is a fixed small
    * constant, so the lineage chain stays shallow (no checkpoint
    * needed, unlike the unbounded components fixpoint).
    *
    * `edges`: (src, dst) — callers symmetrize for undirected graphs.
    * `nodes`: (id) — the full vertex set (isolated nodes included).
    * Output: (id, pr_scaled 1e-9 units, pr 9-dec double). */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = broadcast(nodes.agg(count(lit(1)).as("n")))
    var pr = nodes.crossJoin(n).select(col("id"), expr(s"$PrBase div n").as("pr"))
    for (_ <- 1 to iters) {
      val inflow = edges
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      pr = nodes.crossJoin(n)
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          // 15% of PrBase precomputed in Scala: a 15 * 1e9 SQL-literal
          // product would overflow INT under ANSI
          (expr(s"${15L * PrBase / 100L} div n")
            + expr("(85 * coalesce(s, 0)) div 100")).as("pr"))
    }
    pr.select(col("id"), col("pr").as("pr_scaled"),
      round(col("pr").cast("double") / PrBase.toDouble, 9).as("pr"))
  }

  /** PageRank over the undirected ANN similarity graph
    * ([[Similarity.annPairs]] symmetrized), every embedding row a
    * node: similarity centrality. High-rank vectors anchor dense
    * near-dup neighborhoods; teleport-floor vectors are singletons.
    * Output: (vec_id, pr_scaled, pr). */
  def similarityCentrality(emb: DataFrame, iters: Int = 5): DataFrame = {
    val pairs = Similarity.annPairs(emb)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    pageRank(edges, emb.select(col("vec_id").as("id")), iters)
      .select(col("id").as("vec_id"), col("pr_scaled"), col("pr"))
  }
}
