package graft.meta

import org.apache.spark.sql.DataFrame
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
}
