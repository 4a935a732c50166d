package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DataQuality]] — each check counts EXACTLY the seeded violations. */
class DataQualitySpec extends SparkSpec {
  import DataQuality._
  import spark.implicits._

  // 2 duplicate ids (1 extra row), one null owner, values 5/-1/99
  private lazy val child = Seq(
    (1L, Option(10L), "A", 5.0), (1L, Option(10L), "A", -1.0),
    (2L, Option(11L), "B", 99.0), (3L, None, "X", 50.0))
    .toDF("id", "owner", "status", "v")
  private lazy val parent = Seq(10L).toDF("pid") // 11 is an orphan ref

  private def n(df: org.apache.spark.sql.DataFrame): Long =
    df.collect()(0).getLong(0)

  test("uniqueness counts rows beyond the first per key") {
    assert(n(uniqueViolations(child, Seq("id"))) === 1L)
    assert(n(uniqueViolations(child.limit(0), Seq("id"))) === 0L)
  }

  test("not-null / range / accepted-values count exactly the seeded rows") {
    assert(n(notNullViolations(child, "owner")) === 1L)
    // -1 and 99 are out of [0, 50]; NULLs never violate a range
    assert(n(rangeViolations(child, "v", 0.0, 50.0)) === 2L)
    assert(n(acceptedValuesViolations(child, "status", Seq("A", "B"))) === 1L)
  }

  test("referential integrity counts orphans; NULL keys are not orphans") {
    // rows owned by 11 (one) are orphans; the NULL-owner row is not
    assert(n(refIntegrityViolations(child, "owner", parent, "pid")) === 1L)
  }

  test("report unions named scalars; real tables audit clean where expected") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val rep = report(Seq(
      "pk" -> uniqueViolations(orders, Seq("o_orderkey")),
      "fk" -> refIntegrityViolations(li, "l_orderkey", orders, "o_orderkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep === Map("pk" -> 0L, "fk" -> 0L),
      "driver testdata keeps PK/FK integrity")
  }

  test("driftReport: zero for identical snapshots, large for an engineered shift") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val bucket = least(floor(col("n_chars") / 100), lit(8L))
    // identical snapshots: p == q bucket-for-bucket, every PSI term exactly 0
    val same = driftReport(docs, docs, bucket).collect()
    assert(same.nonEmpty)
    same.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2))
      assert(r.getDouble(3) === 0.0)
    }
    // shares are distributions: each side sums to 1
    assert(math.abs(same.map(_.getDouble(1)).sum - 1.0) < 1e-9)
    // engineered major shift: keep only the longest docs → low buckets go
    // to q=0, mass concentrates high; PSI must read as a major shift
    val shifted = driftReport(docs, docs.filter(col("n_chars") >= 400), bucket)
      .collect()
    val psi = shifted.map(_.getDouble(3)).sum
    assert(psi > 0.25, f"engineered shift scored PSI=$psi%.3f, expected > 0.25")
    // a bucket the current snapshot lost entirely still appears with q=0;
    // PSI terms are never negative ((q-p) and ln(q/p) share sign), and a
    // lost bucket contributes strictly positive drift
    assert(shifted.forall(_.getDouble(3) >= 0))
    val lost = shifted.filter(r => r.getDouble(2) == 0.0)
    assert(lost.nonEmpty && lost.forall(_.getDouble(3) > 0))
  }

  test("chi-squared: hand-computed 2x2, independence ⇒ ~0, empty cells counted") {
    import spark.implicits._
    // classic 2x2: rows (10,20) / (20,10); N=60, all expected = 15;
    // chi2 = 4 * (5^2/15) = 20/3
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = chiSquareIndependence(rows.toDF("u", "v"), col("u"), col("v"))
      .collect().head
    assert(r.getLong(0) === 60L)
    assert(r.getLong(3) === 1L) // dof
    assert(math.abs(r.getDouble(4) - 20.0 / 3.0) < 1e-9)
    // exact product distribution ⇒ chi2 = 0
    val indep = for (u <- Seq("a", "b", "c"); v <- Seq("x", "y"); _ <- 1 to 5)
      yield (u, v)
    val r2 = chiSquareIndependence(indep.toDF("u", "v"), col("u"), col("v"))
      .collect().head
    assert(r2.getDouble(4) === 0.0)
    assert(r2.getLong(3) === 2L)
    // a never-observed cell still contributes its expected count: perfect
    // diagonal association has chi2 = N * (r-1) for square tables
    val diag = Seq.fill(15)(("a", "x")) ++ Seq.fill(15)(("b", "y"))
    val r3 = chiSquareIndependence(diag.toDF("u", "v"), col("u"), col("v"))
      .collect().head
    assert(math.abs(r3.getDouble(4) - 30.0) < 1e-9,
      s"diagonal 2x2 must score chi2 = N, got ${r3.getDouble(4)}")
  }

  test("chi-squared: NULL categories count as a real category, tot stays N") {
    import spark.implicits._
    // nulls only in column u, perfectly associated with v = "y": treating
    // NULL as its own category gives the same diagonal-association chi2
    // as the spelled-out sentinel version. Before the null-safe fix the
    // (va, vb) equi-join dropped these cells: tot < N and chi2 was wrong.
    val withNulls: Seq[(Option[String], String)] =
      Seq.fill(15)((Option("a"), "x")) ++ Seq.fill(15)((Option.empty[String], "y"))
    val r = chiSquareIndependence(withNulls.toDF("u", "v"), col("u"), col("v"))
      .collect().head
    assert(r.getLong(0) === 30L, "tot must still count the null-category rows")
    assert(r.getLong(1) === 2L, "NULL is a category of its own")
    assert(math.abs(r.getDouble(4) - 30.0) < 1e-9,
      s"null-diagonal 2x2 must score chi2 = N, got ${r.getDouble(4)}")
  }

  test("chi-squared: a literal U+0000 string category never merges with NULL") {
    import spark.implicits._
    // string columns can legally contain NUL — an in-band sentinel would
    // silently merge this category with the NULL category; the struct
    // (is_null, value) key keeps them distinct
    val rows: Seq[(Option[String], String)] =
      Seq.fill(10)((Option("\u0000"), "x")) ++
        Seq.fill(10)((Option.empty[String], "y")) ++
        Seq.fill(10)((Option("a"), "z"))
    val r = chiSquareIndependence(rows.toDF("u", "v"), col("u"), col("v"))
      .collect().head
    assert(r.getLong(0) === 30L)
    assert(r.getLong(1) === 3L,
      "NUL, NULL and 'a' must be THREE distinct categories")
    assert(math.abs(r.getDouble(4) - 60.0) < 1e-9,
      s"diagonal 3x3 must score chi2 = 2N, got ${r.getDouble(4)}")
  }
}
