package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph connectivity — the clustering step behind near-dup
  * deduplication (and any entity-resolution pass): collapse the verified
  * pair graph into components, keep one canonical row per component.
  */
object GraphFunctions {

  /** Connected components by iterative min-label propagation.
    *
    * `edges` is an undirected edge list (src, dst); `vertices` one id per
    * row. Returns (id, label) with label = the smallest id reachable —
    * rows where `id === label` are the component canonicals.
    *
    * Scale shape: each round is one join of the (symmetrized) edge list
    * against the current labels plus a min-aggregation — keys only, no
    * payloads — and `localCheckpoint` truncates the lineage so round R
    * costs O(E) not O(R·E) (superseded checkpoints are released by the
    * ContextCleaner as their references drop). Each round also applies a
    * pointer-jumping step (label ← label-of-label), so convergence is
    * O(log diameter) rounds, not O(diameter) — the default
    * `maxIterations` covers components of diameter ≫ 2^10. The loop
    * exits early on a fixed point and THROWS if the budget is exhausted
    * before convergence rather than returning silently wrong labels.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          idCol: String = "id",
                          srcCol: String = "src", dstCol: String = "dst",
                          maxIterations: Int = 10): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("label"))
    var i = 0
    var converged = false
    while (i < maxIterations && !converged) {
      val neighbourLabels = sym
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("dst_label")).as("min_neighbour"))
      val propagated = labels
        .join(neighbourLabels, labels("id") === neighbourLabels("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("min_neighbour"), col("label"))).as("label"))
      // pointer jumping: label ← label's own label, collapsing chains
      // exponentially (d1–d2–…–dk resolves in O(log k), not O(k) rounds)
      val next = propagated.alias("l")
        .join(propagated.select(col("id").as("p_id"), col("label").as("p_label")),
          col("l.label") === col("p_id"), "left")
        .select(col("l.id").as("id"),
          least(col("l.label"), coalesce(col("p_label"), col("l.label"))).as("label"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).head(1).isEmpty
      labels = next
      i += 1
    }
    if (!converged) {
      converged = {
        val neighbourLabels = sym
          .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), Seq("dst"))
          .groupBy(col("src")).agg(min(col("dst_label")).as("min_neighbour"))
        labels.join(neighbourLabels, labels("id") === neighbourLabels("src"), "left")
          .filter(col("min_neighbour") < col("label")).head(1).isEmpty
      }
      require(converged,
        s"connectedComponents did not converge in $maxIterations rounds — " +
          "raise maxIterations (labels would be silently wrong)")
    }
    labels
  }
}
