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
  * Rounds saved are log(δ_warm/δ_cold)/log(contraction rate): the payoff
  * scales with how SMALL the per-batch growth is relative to the graph.
  * `oldFrac` sets the previous batch's share (default 0.99 — a 1%-growth
  * crawl batch; at 0.90 the perturbation is so large warm ≈ cold, which
  * is the honest answer for bulk re-crawls).
  *
  * Usage: sbt "runMain graft.tools.PageRankConverge [nVertices] [tol] [oldFrac]"
  * (default 2000000, 1e-8, 0.99). */
object PageRankConverge {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val tol = args.drop(1).headOption.map(_.toDouble).getOrElse(1e-8)
    val oldFrac = args.drop(2).headOption.map(_.toDouble).getOrElse(0.99)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val G = graft.functions.GraphFunctions

    // deterministic 3-out graph with POWER-BIASED destinations: dst =
    // ⌊n·u³⌋ for a hash-uniform u concentrates in-links on low ids
    // (density ∝ x^(−2/3)), the heavy-tailed shape of a real web graph.
    // On a flat-rank graph (uniform dst) the fixed point sits next to
    // the uniform vector and COLD start is already near-optimal — warm
    // start's payoff exists only when the stationary vector is far from
    // uniform, which skew provides. The "old" graph is the first 90% of
    // vertices with edges wholly inside them.
    val verts = spark.range(n).select(col("id")).localCheckpoint(true)
    val u = (((col("id") * 2654435761L + 13L) % 1000003L).cast("double")
      / 1000003.0)
    val edges = spark.range(3 * n).select(
        (col("id") % n).as("src"),
        floor(lit(n.toDouble) * pow(u, 3.0)).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    val oldN = (n * (oldFrac * 1000).toLong) / 1000
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
    println(f"[pagerank-converge] n=$n%,d vertices, tol=$tol%g, oldFrac=$oldFrac " +
      f"(prev vector: $prevRounds rounds on the old graph, $tPrev%.1f s)")
    println(f"[pagerank-converge] cold (uniform init): $coldRounds rounds, $tCold%.1f s")
    println(f"[pagerank-converge] warm (prev vector):  $warmRounds rounds, $tWarm%.1f s " +
      f"— ${coldRounds.toDouble / warmRounds}%.1fx fewer rounds, ${tCold / tWarm}%.1fx wall")
    spark.stop()
  }
}
