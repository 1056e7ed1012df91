package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Convergence/latency probe for Dedup.components. Modes:
  *   CcProbe emb <sfDir>   — components over embeddingNearDups pairs
  *   CcProbe chain <n>     — synthetic n-node path graph (worst-case
  *                           diameter; pointer doubling should close
  *                           it in ~log2(n) rounds)
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = args.toList match {
      case "chain" :: n :: Nil =>
        spark.range(n.toLong - 1)
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      case "emb" :: dir :: Nil =>
        val docs = graft.Tables.documents(spark, dir)
        val emb = graft.Tables.embeddings(spark, dir)
        graft.pipeline.Dedup.embeddingNearDups(docs, emb).select("doc_a", "doc_b")
      case other => sys.error(s"usage: CcProbe chain <n> | emb <sfDir>; got $other")
    }
    val t0 = System.nanoTime()
    val df = graft.pipeline.Dedup.components(pairs, maxIters = 64)
    println("rows=" + df.count() + " total=" + ((System.nanoTime() - t0) / 1e9))
    println("trace=" + graft.pipeline.Dedup.lastComponentsTrace.map { case (i, c, s) => f"($i,$c,$s%.2f)" }.mkString(" "))
    spark.stop()
  }
}
