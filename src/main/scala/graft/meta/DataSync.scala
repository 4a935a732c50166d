package graft.meta

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Object-store sync planning — the reference's DataSynchronizer
  * check/copy/remove bookkeeping (sync.py:44–164: list both sides,
  * existence+size check per file, copy what is missing or differs,
  * optionally delete what the source no longer has) re-expressed as one
  * relational plan over the two listings.
  *
  * The reference loops file-by-file over boto3 calls; at lake scale the
  * listings themselves are DataFrames (S3 inventory / `LIST` manifests)
  * and the sync plan is a single full-outer join on the path — the
  * actual byte transfer is then driven from the plan (distributed, one
  * task per file batch), which is exactly how the s3a committers and
  * DistCp-style tools structure it.
  *
  * Actions: COPY (missing at dest, or size differs — the reference's
  * existence/size check), SKIP (present and identical), REMOVE (at dest
  * but no longer at source; only meaningful when the caller mirrors).
  *
  * Scale shape: one path-keyed full-outer join of two listing tables —
  * listings are rows-per-file (10⁶–10⁹), payload is (path, size), and
  * the join partial-prunes both sides to the two columns. No driver
  * loops, no per-file API calls at plan time.
  */
object DataSync {

  /** Sync plan from `src`/`dst` listings, both shaped (pathCol, sizeCol).
    * Output: (path, src_size, dst_size, action). */
  def plan(src: DataFrame, dst: DataFrame,
           pathCol: String, sizeCol: String): DataFrame = {
    val s = src.select(col(pathCol).as("path"), col(sizeCol).as("src_size"))
    val d = dst.select(col(pathCol).as("path"), col(sizeCol).as("dst_size"))
    s.join(d, Seq("path"), "full_outer")
      .select(col("path"), col("src_size"), col("dst_size"),
        when(col("src_size").isNull, "REMOVE")
          .when(col("dst_size").isNull, "COPY")
          .when(col("src_size") =!= col("dst_size"), "COPY")
          .otherwise("SKIP").as("action"))
  }

  /** Per-action summary of a [[plan]]: file count and bytes to move —
    * the capacity estimate a sync job prints before running. */
  def planSummary(planned: DataFrame): DataFrame =
    planned.groupBy(col("action"))
      .agg(count(lit(1)).as("n_files"),
        sum(coalesce(col("src_size"), lit(0L))).as("src_bytes"))
      .orderBy(col("action"))

  /** One executed [[plan]] row: what was attempted and how it went. */
  final case class SyncResult(path: String, action: String, ok: Boolean,
                              error: String)

  /** APPLY a [[plan]]: move the bytes the reference's DataSynchronizer
    * moves file-by-file from the driver (sync.py:103–116 download loop,
    * :131–152 delete_objects) — distributed, one task per plan-row batch,
    * through the Hadoop FileSystem API (so local/HDFS/S3A all route
    * through the same calls).
    *
    * Idempotent by construction: COPY overwrites whatever half-written
    * dest exists (re-running a crashed sync converges), REMOVE of an
    * already-absent file reports ok (delete returning false with no
    * existing file is success — the state IS synchronized), SKIP touches
    * nothing. A failed row reports `ok=false` with the exception text
    * instead of failing the job: one unreadable file must not abort a
    * 10⁹-file sync — the caller re-plans and retries the residue, which
    * is exactly the reference's per-file try/except routing.
    *
    * Scale shape: plan rows shuffle-free into `mapPartitions`; each task
    * opens its own FileSystem handles (Hadoop caches per-scheme
    * instances). Throughput scales with executors × partitions, the way
    * DistCp structures the same problem. */
  def execute(planned: DataFrame, srcRoot: String, dstRoot: String): Dataset[SyncResult] = {
    val spark = planned.sparkSession
    import spark.implicits._
    // Hadoop Configuration is not serializable; ship its entries and
    // rebuild per partition so executors see the driver's FS settings
    val confEntries: Array[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val src = srcRoot.stripSuffix("/")
    val dst = dstRoot.stripSuffix("/")
    planned.select(col("path").cast("string"), col("action").cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        import org.apache.hadoop.fs.{FileUtil, Path => HPath}
        it.map { case (path, action) =>
          try {
            action match {
              case "COPY" =>
                val from = new HPath(s"$src/$path")
                val to = new HPath(s"$dst/$path")
                val sfs = from.getFileSystem(conf)
                val dfs = to.getFileSystem(conf)
                dfs.mkdirs(to.getParent)
                val ok = FileUtil.copy(sfs, from, dfs, to,
                  /*deleteSource=*/ false, /*overwrite=*/ true, conf)
                SyncResult(path, action, ok, null)
              case "REMOVE" =>
                val to = new HPath(s"$dst/$path")
                val dfs = to.getFileSystem(conf)
                val gone = !dfs.exists(to) || dfs.delete(to, false)
                SyncResult(path, action, gone, null)
              case _ =>
                SyncResult(path, action, ok = true, null)
            }
          } catch {
            case e: Exception =>
              SyncResult(path, action, ok = false,
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
  }
}
