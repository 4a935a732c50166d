package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the warm-start pageRank payoff the r18 verdict asked for —
  * the convergence early-exit turns "start from the previous vector"
  * from a determinism contract (q205) into actual saved rounds:
  *
  *   cold  — pageRankWithRounds(uniform init, tolerance): rounds until
  *           ‖r_t − r_{t−1}‖₁ < tol on the full graph;
  *   warm  — the incremental-crawl regime: converge on the first 90% of
  *           the graph, then re-rank the GROWN graph (all vertices +
  *           edges) starting from that vector. New vertices default to
  *           1/N; the contraction only has to absorb the perturbation,
  *           not rebuild the vector from uniform.
  *
  * Both runs use the same tolerance; the row prints rounds and wall for
  * each. The saved-rounds ratio is the number a per-batch re-rank
  * multiplies into its whole frontier cadence.
  *
  * Usage: sbt "runMain graft.tools.PageRankConverge [nVertices] [tol]"
  * (default 2000000, 1e-8). */
object PageRankConverge {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val tol = args.drop(1).headOption.map(_.toDouble).getOrElse(1e-8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val G = graft.functions.GraphFunctions

    // deterministic pseudo-random 3-out multigraph (the q192 generator's
    // shape at tool scale); the "old" graph is the first 90% of vertices
    // with edges wholly inside them
    val verts = spark.range(n).select(col("id")).localCheckpoint(true)
    val edges = spark.range(3 * n).select(
        (col("id") % n).as("src"),
        ((col("id") * 2654435761L + col("id") % 97) % n).as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    val oldN = (n * 9) / 10
    val oldVerts = verts.filter(col("id") < oldN).localCheckpoint(true)
    val oldEdges = edges.filter(col("src") < oldN && col("dst") < oldN)
      .localCheckpoint(true)

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // the previous batch's vector: converged on the 90% graph
    val (tPrev, (prev, prevRounds)) = time {
      val (df, r) = G.pageRankWithRounds(oldVerts, oldEdges,
        iterations = 200, tolerance = Some(tol))
      (df.localCheckpoint(true), r)
    }
    val (tCold, (_, coldRounds)) = time {
      val (df, r) = G.pageRankWithRounds(verts, edges,
        iterations = 200, tolerance = Some(tol))
      df.count(); (df, r)
    }
    val (tWarm, (_, warmRounds)) = time {
      val (df, r) = G.pageRankWithRounds(verts, edges,
        iterations = 200, tolerance = Some(tol), initialRanks = Some(prev))
      df.count(); (df, r)
    }
    println(f"[pagerank-converge] n=$n%,d vertices, tol=$tol%g " +
      f"(prev vector: $prevRounds rounds on the 90%% graph, $tPrev%.1f s)")
    println(f"[pagerank-converge] cold (uniform init): $coldRounds rounds, $tCold%.1f s")
    println(f"[pagerank-converge] warm (prev vector):  $warmRounds rounds, $tWarm%.1f s " +
      f"— ${coldRounds.toDouble / warmRounds}%.1fx fewer rounds, ${tCold / tWarm}%.1fx wall")
    spark.stop()
  }
}
