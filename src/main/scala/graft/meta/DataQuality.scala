package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/expectations shape): each
  * check reduces a table to ONE violation count; a report is the union of
  * those scalars. The reference validates row-by-row at ingest
  * (forms/Marshmallow, SURVEY §2.2 P6) — at lake scale validation is a
  * batch audit over the whole table, so each check must be a single
  * scan-shaped aggregate, never a row loop.
  *
  * Scale shape: uniqueness/nullability/range/accepted-values are one
  * aggregate each (map-side partials, scalar out); referential integrity
  * is an anti-join that broadcasts when the parent's key set fits and
  * shuffles by key otherwise — Catalyst's choice, both correct. Checks
  * over the same table can share one pass via [[report]]'s grouping of
  * single-table aggregates (columnar scan reuse), though the audit is
  * embarrassingly parallel across tables either way.
  */
object DataQuality {

  /** Rows beyond the first per key — 0 iff `cols` is a unique key. */
  def uniqueViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg((count(lit(1)) - countDistinct(cols.head, cols.tail: _*)).as("n_violations"))

  /** NULLs in a required column. */
  def notNullViolations(df: DataFrame, c: String): DataFrame =
    df.agg(count(when(col(c).isNull, 1)).as("n_violations"))

  /** Child rows whose NON-NULL key has no parent — referential-integrity
    * orphans. NULL keys are a not-null check's concern, not RI (SQL FK
    * semantics). Anti-join on the key only (payloads pruned first). */
  def refIntegrityViolations(child: DataFrame, childKey: String,
                             parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey)).filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Values outside [lo, hi] (NULLs don't violate a range check). */
  def rangeViolations(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    df.agg(count(when(col(c) < lo || col(c) > hi, 1)).as("n_violations"))

  /** Values outside the accepted set (NULLs don't violate). */
  def acceptedValuesViolations(df: DataFrame, c: String,
                               accepted: Seq[String]): DataFrame =
    df.agg(count(when(col(c).isNotNull && !col(c).isInCollection(accepted), 1))
      .as("n_violations"))

  /** Assemble named checks into one (check, n_violations) report. */
  def report(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, df) =>
      df.select(lit(name).as("check"), col("n_violations"))
    }.reduce(_.unionByName(_))
}
