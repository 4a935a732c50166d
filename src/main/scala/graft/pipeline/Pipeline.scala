package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataflow orchestration: the engine's replacement for the reference's
  * Celery task DAGs (SURVEY.md §2.11).
  *
  * Reference semantics reproduced:
  *  - nested chain/group task trees (controller.py:163–186, 318–365)
  *  - idempotent activity creation on unique (collection_id, activity_type,
  *    sceneid) (collections/models.py:61; utils.py:64–91 get_or_create)
  *  - per-activity execution history with status tracking (models.py:90–128)
  *  - retry-with-backoff for transient failures (tasks.py:129–134:
  *    max_retries=72, delay=900 s)
  *  - provider priority failover (collect.py:86–137)
  *
  * Architecture: activities/edges/executions are plain DataFrames persisted
  * as parquet; the DAG walk is a driver-side topological loop over stage
  * LEVELS (depth of the task tree, single digits), while everything inside
  * a level is data-parallel across executors. State mutation is
  * merge-by-key (union + window top-1) — the Delta-MERGE pattern without a
  * Delta dependency.
  */
object Pipeline {

  /** A node of the reference's nested task tree (controller.py:318–365):
    * children run after the parent; sibling children form a group
    * (parallel). A linear chain is nodes with single children. */
  final case class TaskNode(taskType: String, children: Seq[TaskNode] = Nil)

  /** Flatten a task tree into (activity_type, parent_type, level) rows. */
  def flattenTree(root: TaskNode): Seq[(String, Option[String], Int)] = {
    def walk(n: TaskNode, parent: Option[String], level: Int): Seq[(String, Option[String], Int)] =
      (n.taskType, parent, level) +: n.children.flatMap(walk(_, Some(n.taskType), level + 1))
    walk(root, None, 0)
  }

  /** Build the activities + lineage-edge DataFrames for scenes × task tree
    * (the _recursive dispatch of controller.py:318–365). One row per
    * (scene, node); edges mirror the activity_src table (models.py:66–87). */
  def planActivities(scenes: DataFrame, sceneIdCol: String, collectionId: Int,
                     tree: TaskNode)(implicit spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val nodes = flattenTree(tree).toDF("activity_type", "parent_type", "level")
    val acts = scenes.select(col(sceneIdCol).as("sceneid"))
      .distinct() // SET1: dedup before fan-out (controller.py:266)
      .crossJoin(broadcast(nodes))
      .withColumn("collection_id", lit(collectionId))
      .withColumn("status", lit("PENDING"))
      .withColumn("retry_count", lit(0))
    val edges = acts.filter(col("parent_type").isNotNull)
      .select(col("sceneid"), col("collection_id"),
        col("activity_type").as("child_type"), col("parent_type"))
    (acts, edges)
  }

  /** Idempotent merge-by-key: `MERGE INTO` semantics over parquet-backed
    * DataFrames (ST4; models.py:61 unique constraint). Keeps the staged row
    * when the key exists in both (staged wins via precedence flag), existing
    * row otherwise. Single shuffle on the key. */
  def mergeByKey(existing: DataFrame, staged: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = existing.columns
    require(staged.columns.sameElements(cols), "merge requires identical schemas")
    val tagged = existing.withColumn("__prec", lit(0))
      .unionByName(staged.withColumn("__prec", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prec").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__prec")
  }

  /** One stage-execution attempt outcome. */
  final case class StageResult(df: DataFrame)

  /** A stage kernel: takes the activities selected for this stage, returns
    * them with a `status` column in {SUCCESS, FAILURE, RETRY}. RETRY marks
    * transient failures (the reference's DataOfflineError/
    * InvalidChecksumError, tasks.py:129–134). */
  type StageKernel = DataFrame => DataFrame

  /** Run a task tree level-by-level in batch ("task_always_eager" mode,
    * celery/__init__.py:63–67): a level's activities run only when their
    * parent activity for the same scene reached SUCCESS; transient RETRY
    * rows are re-attempted up to `maxRetries` inside the level (the batch
    * analogue of re-enqueue-with-backoff). Returns (final activities,
    * executions log).
    */
  def runBatch(activities: DataFrame, tree: TaskNode,
               kernels: Map[String, StageKernel], maxRetries: Int = 3)
              (implicit spark: SparkSession): (DataFrame, DataFrame) = {
    val levels = flattenTree(tree).groupBy(_._3).toSeq.sortBy(_._1)
    var acts = activities
    var executions = spark.emptyDataFrame
    var haveExec = false
    for ((_, nodes) <- levels; (taskType, parentType, _) <- nodes) {
      val kernel = kernels.getOrElse(taskType,
        throw new IllegalArgumentException(s"no kernel for stage $taskType"))
      // runnable = PENDING activities of this type whose parent succeeded
      val mine = acts.filter(col("activity_type") === taskType && col("status") === "PENDING")
      val runnable = parentType match {
        case None => mine
        case Some(p) =>
          val okParents = acts.filter(col("activity_type") === p && col("status") === "SUCCESS")
            .select(col("sceneid"), col("collection_id"))
          mine.join(okParents, Seq("sceneid", "collection_id"), "left_semi")
      }
      var pending = runnable
      var attempt = 0
      var done: DataFrame = null
      while (attempt <= maxRetries && pending.head(1).nonEmpty) {
        val res = kernel(pending).withColumn("attempt", lit(attempt))
        val exec = res.select(col("sceneid"), col("collection_id"),
          col("activity_type"), col("status"), col("attempt"))
        executions = if (haveExec) executions.unionByName(exec) else exec
        haveExec = true
        val finished = res.filter(col("status") =!= "RETRY")
        done = if (done == null) finished else done.unionByName(finished)
        pending = res.filter(col("status") === "RETRY")
          .withColumn("status", lit("PENDING"))
          .withColumn("retry_count", col("retry_count") + 1)
          .drop("attempt")
        attempt += 1
      }
      // retries exhausted → FAILURE (dead-letter, ST3)
      val exhausted = pending.withColumn("status", lit("FAILURE"))
      val settled = if (done == null) exhausted else done.drop("attempt").unionByName(exhausted)
      acts = mergeByKey(acts, settled.select(acts.columns.map(col): _*),
        Seq("sceneid", "collection_id", "activity_type"))
      // cache the merged state: each level re-reads it
      acts = acts.localCheckpoint(eager = true)
    }
    (acts, executions)
  }

  /** Provider priority failover (collect.py:86–137): given per-(scene,
    * provider) fetch outcomes and the provider priority table, pick the
    * first success in priority order per scene — the ordered short-circuit
    * loop as a window top-1. Providers with `active=false` are skipped
    * (models.py:166–185). */
  def firstSuccessByPriority(outcomes: DataFrame, providers: DataFrame): DataFrame = {
    val active = providers.filter(col("active"))
      .select(col("provider_id"), col("priority"))
    val w = Window.partitionBy(col("sceneid")).orderBy(col("priority").asc)
    outcomes.join(broadcast(active), Seq("provider_id"))
      .filter(col("ok"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
