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
    * costs O(E) not O(R·E). Rounds needed = component diameter; near-dup
    * clusters are small and dense, so a handful of rounds converges (the
    * loop exits early on a fixed point). For web-scale general graphs the
    * large-star/small-star variant halves round count; diameter-bounded
    * dedup graphs don't need it.
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
      val next = labels.join(neighbourLabels, labels("id") === neighbourLabels("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("min_neighbour"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).head(1).isEmpty
      labels = next
      i += 1
    }
    labels
  }
}
