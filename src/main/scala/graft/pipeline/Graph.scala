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
  def similarityCentrality(emb: DataFrame, iters: Int = 5): DataFrame =
    similarityCentralityFromPairs(emb, Similarity.annPairsAdaptive(emb), iters)

  /** [[similarityCentrality]] served from a prebuilt ANN pair table
    * ([[Similarity.annPairsCached]]) — the PageRank iterations price
    * as reads of the build-once candidate graph. */
  def similarityCentralityFromPairs(emb: DataFrame, pairs: DataFrame,
      iters: Int = 5): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    pageRank(edges, emb.select(col("vec_id").as("id")), iters)
      .select(col("id").as("vec_id"), col("pr_scaled"), col("pr"))
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected edge list — the graph-density audit of a similarity
    * graph: a near-dup CLIQUE (every pair similar) is redundant
    * content to collapse, a near-dup STAR (hub similar to many
    * mutually-dissimilar docs) is a template with distinct fillings;
    * triangle density is exactly what separates them.
    *
    * Degree-ordered orientation (the standard distributed-triangle
    * trick, cf. Suri & Vassilvitskii WWW'11 "Counting triangles and
    * the curse of the last reducer"): orient each undirected edge
    * from the lower (degree, id) endpoint to the higher, then wedges
    * u→v, u→w with v<w are enumerated only at their LOWEST-degree
    * corner — a hub of degree d contributes O(d) oriented edges but
    * almost no wedge fan-out, so the curse-of-the-last-reducer hot
    * task never forms. Each triangle is found exactly once and
    * closed by one equi-join back to the oriented edge list.
    *
    * Clustering coefficient is exact integers: (2·tri·1e4) div
    * (deg·(deg−1)), 0 for degree < 2. `edges` is DIRECTED input —
    * callers pass the symmetrized list (both (a,b) and (b,a));
    * self-loops are dropped. Output: (id, degree, n_triangles,
    * cc_q). */
  def triangles(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val e = edges.filter(col("src") =!= col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    // rank = (deg, id) lexicographic; orient src -> dst iff rank(src) < rank(dst)
    val withRank = e
      .join(deg.select(col("id").as("src"), col("deg").as("deg_s")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("deg_d")), Seq("dst"))
    val oriented = withRank
      .filter(col("deg_s") < col("deg_d") ||
        (col("deg_s") === col("deg_d") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("deg_d"))
    // wedges at the low corner: u->v, u->w with v BEFORE w in the SAME
    // (deg, id) rank order used to orient — the closing edge, if it
    // exists, is then oriented exactly v->w (ordering by raw id would
    // look for half the closers in the direction that was filtered out)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src"))
      .filter(col("e1.deg_d") < col("e2.deg_d") ||
        (col("e1.deg_d") === col("e2.deg_d") && col("e1.dst") < col("e2.dst")))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    // credit all three corners
    val perNode = tris.select(col("u").as("id"))
      .union(tris.select(col("v").as("id")))
      .union(tris.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    nodes
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("cc_q",
        when(col("degree") >= 2L,
          expr("2 * n_triangles * 10000 div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
  }

  /** [[triangles]] over the symmetrized minhash-LSH candidate graph on
    * documents, every doc a node — the text-plane near-dup graph is
    * where cliques actually form (template families collide into
    * multi-doc clusters; the embedding ANN graph on this corpus is a
    * matching of planted pairs, triangle-free by construction).
    * Output: (doc_id, degree, n_triangles, cc_q). */
  def nearDupTriangles(docs: DataFrame): DataFrame =
    nearDupTrianglesFromPairs(docs, Dedup.minhashCandidates(docs))

  /** [[nearDupTriangles]] served from a prebuilt candidate-pair table
    * ([[Dedup.nearDupIndex]].pairs) — read-path cost only: the
    * orientation + wedge joins, no LSH band build. */
  def nearDupTrianglesFromPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    triangles(edges, docs.select(col("doc_id").as("id")))
      .select(col("id").as("doc_id"), col("degree"), col("n_triangles"), col("cc_q"))
  }
}
