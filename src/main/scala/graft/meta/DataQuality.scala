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

  /** Distribution-drift report between a reference snapshot and a current
    * one — the monitoring half of data quality: the checks above catch
    * BROKEN rows, this catches a corpus whose rows are individually fine
    * but collectively shifted (a crawler change, a filter regression, a
    * source going dark). Per feature bucket it emits the reference share
    * `p`, the current share `q`, and the population-stability-index term
    * `(q−p)·ln((q+ε)/(p+ε))`; Σ terms = PSI, with the standard reading
    * (< 0.1 stable, 0.1–0.25 moderate, > 0.25 major shift). Buckets both
    * sides miss are absent; one-sided buckets are ε-smoothed (the usual
    * PSI convention — log of an exact 0 share is undefined, and a brand
    * new bucket IS drift, not an error).
    *
    * `bucketCol` must be a deterministic function of the row (a value
    * bucket like `floor(n_chars/500)`, a category like `lang`) — NOT a
    * data-dependent quantile, which would move with the drift it is meant
    * to measure.
    *
    * Scale shape: one aggregate per snapshot (map-side partials, ≤
    * #buckets rows out), a broadcast-sized full-outer join of the two
    * histograms, arithmetic. The snapshots themselves never shuffle. */
  def driftReport(ref: DataFrame, cur: DataFrame, bucketCol: Column,
                  eps: Double = 1e-6): DataFrame = {
    def hist(df: DataFrame, share: String): DataFrame = {
      val h = df.groupBy(bucketCol.cast("string").as("bucket"))
        .agg(count(lit(1)).as("n"))
      // normalize over the histogram itself (≤ #buckets rows — the
      // single-partition window is bounded), not a second corpus scan
      h.withColumn(share,
        col("n").cast("double") / sum(col("n")).over()).drop("n")
    }
    hist(ref, "p").join(hist(cur, "q"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("p"), lit(0.0)).as("p"),
        coalesce(col("q"), lit(0.0)).as("q"))
      .withColumn("psi_term",
        (col("q") - col("p")) *
          log((col("q") + lit(eps)) / (col("p") + lit(eps))))
  }

  /** Pearson chi-squared test of independence between two categorical
    * columns — the statistical companion to [[driftReport]]: PSI asks
    * "did THIS dimension's mix move between snapshots", this asks "are
    * these two dimensions associated at all" (language × source,
    * label × shard, …), which is how a corpus audit catches a scraper
    * that only collects one language from one domain, or a split whose
    * strata leaked. Returns one row: N, the contingency dimensions, the
    * degrees of freedom (r−1)(c−1), and the χ² statistic
    * Σ (observed − expected)² / expected over cells with expected > 0.
    *
    * Scale shape: ONE groupBy over the column pair (map-side partials;
    * output is |a|×|b| cells, category-product bounded); marginals and
    * the statistic are windows/aggregates over that tiny cell table. The
    * corpus crosses one exchange, keyed on the pair. */
  def chiSquareIndependence(df: DataFrame, a: Column, b: Column): DataFrame = {
    // NULL is a real category for an audit (a missing language IS a
    // signal), but a plain equi-join on (va, vb) would never match null
    // keys when the grid re-attaches observed counts — the cell would
    // silently zero while the marginals still counted it (tot < N, chi2
    // wrong). Key on a (is_null, coalesced-value) STRUCT: both fields are
    // non-null, so every downstream equality is plain, and no in-band
    // sentinel exists to collide with — string columns can legally
    // contain ANY value, including U+0000.
    def catKey(c: Column): Column = {
      val s = c.cast("string")
      struct(s.isNull.as("is_null"), coalesce(s, lit("")).as("v"))
    }
    val cells = df.groupBy(catKey(a).as("va"), catKey(b).as("vb"))
      .agg(count(lit(1)).as("n"))
    val rowM = cells.groupBy(col("va")).agg(sum(col("n")).as("row_n"))
    val colM = cells.groupBy(col("vb")).agg(sum(col("n")).as("col_n"))
    // complete the r×c grid: a cell nobody observed still contributes its
    // expected count to the statistic. The cross join is category-product
    // bounded — cells, not corpus rows
    val grid = rowM.crossJoin(colM)
      .join(cells, Seq("va", "vb"), "left")
      .withColumn("nij", coalesce(col("n"), lit(0L)))
      .withColumn("tot", sum(col("nij")).over())
      .withColumn("e",
        col("row_n").cast("double") * col("col_n") / col("tot"))
    grid.agg(
      max(col("tot")).as("n"),
      countDistinct(col("va")).as("n_rows"),
      countDistinct(col("vb")).as("n_cols"),
      ((countDistinct(col("va")) - 1) * (countDistinct(col("vb")) - 1)).as("dof"),
      sum(pow(col("nij") - col("e"), 2) / col("e")).as("chi2"))
  }
}
