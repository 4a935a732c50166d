package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph connectivity — the clustering step behind near-dup
  * deduplication (and any entity-resolution pass): collapse the verified
  * pair graph into components, keep one canonical row per component.
  */
object GraphFunctions {

  /** Component labels with the SAME two-path shape as
    * [[DedupFunctions.dropByPairGraph]]: a verified near-dup edge set is
    * tiny relative to the corpus (only true near-dups survive
    * verification), so resolve union-find driver-side and broadcast the
    * label map back — zero iterative jobs; past `maxDriverEdges` fall
    * back to distributed [[connectedComponents]]. Returns (id, label),
    * label = smallest id reachable; vertices with no edge label
    * themselves. */
  def componentLabels(vertices: DataFrame, edges: DataFrame,
                      idCol: String = "id",
                      srcCol: String = "src", dstCol: String = "dst",
                      maxIterations: Int = 10,
                      maxDriverEdges: Int = 100_000): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(true)
    if (e.limit(maxDriverEdges + 1).count() <= maxDriverEdges) {
      val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(id => (id, find(id))).filter { case (id, l) => id != l }
      val spark = vertices.sparkSession
      import spark.implicits._
      val labelMap = broadcast(
        spark.createDataset(touched.toIndexedSeq).toDF("id", "label"))
      vertices.select(col(idCol).cast("long").as("id"))
        .join(labelMap, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    } else {
      connectedComponents(vertices.select(col(idCol).cast("long").as("id")), e,
        idCol = "id", srcCol = "src", dstCol = "dst",
        maxIterations = maxIterations)
    }
  }

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
    // materialize the INPUTS once: the loop touches `sym` every round and
    // `labels` twice per round, and without a checkpoint each touch
    // re-executes (and re-plans) the caller's entire upstream pipeline —
    // for a near-dup pair graph that upstream is the whole corpus scan +
    // signature + bucketed join. O(E)+O(V) executor storage, exactly the
    // standard shape for an iterative algorithm.
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(true)
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("label"))
      .localCheckpoint(true)
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
