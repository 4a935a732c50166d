package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class BandExpressionCompilerSpec extends SparkSpec {
  import BandExpressionCompiler._

  private def evalScalar(src: String, binds: Map[String, Double]): Double = {
    val c = compile(src, binds.map { case (k, v) => k -> lit(v) })
    spark.range(1).select(c.cast("double").as("v")).head().getDouble(0)
  }

  test("NDVI expression from the reference collection config") {
    // examples/data/sentinel-2-l2a.json expression band
    val v = evalScalar("10000. * ((B08 - B04) / (B08 + B04))",
      Map("B08" -> 8000.0, "B04" -> 2000.0))
    assert(math.abs(v - 6000.0) < 1e-9)
  }

  test("EVI-style expression with constants and precedence") {
    val src = "10000. * 2.5 * (B08 - B04) / (B08 + 6. * B04 - 7.5 * B02 + 10000.)"
    val b = Map("B08" -> 5000.0, "B04" -> 1000.0, "B02" -> 800.0)
    val expected = 10000.0 * 2.5 * (5000.0 - 1000.0) / (5000.0 + 6.0 * 1000.0 - 7.5 * 800.0 + 10000.0)
    assert(math.abs(evalScalar(src, b) - expected) < 1e-6)
  }

  test("power is right-associative and binds tighter than unary minus applies") {
    assert(math.abs(evalScalar("2 ** 3 ** 2", Map.empty) - 512.0) < 1e-9)
    assert(math.abs(evalScalar("-2 ** 2", Map.empty) - 4.0) < 1e-9) // (-2)**2 in our grammar
  }

  test("whitelisted functions work") {
    assert(evalScalar("min(B1, B2) + max(B1, B2)", Map("B1" -> 3.0, "B2" -> 7.0)) == 10.0)
    assert(evalScalar("sqrt(abs(0. - B1))", Map("B1" -> 16.0)) == 4.0)
  }

  test("non-whitelisted constructs are rejected (interpreter.py:35 sandbox)") {
    assertThrows[IllegalArgumentException](parse("__import__('os')"))
    assertThrows[IllegalArgumentException](parse("exec(x)"))
    assertThrows[IllegalArgumentException](parse("B08; B04"))
    assertThrows[IllegalArgumentException](parse("B08 > B04"))
    assertThrows[IllegalArgumentException](compile("B08 + B09", Map("B08" -> lit(1))))
  }

  test("references collects all band names") {
    assert(references(parse("min(B08, B8A) * NIR - 3.")) == Set("B08", "B8A", "NIR"))
  }

  test("property: compiled arithmetic matches Scala evaluation") {
    val leaf = Gen.oneOf(
      Gen.choose(1.0, 100.0).map(v => { val s = f"$v%.3f"; (s, s.toDouble) }),
      Gen.oneOf(("A", 2.5), ("B", 4.0), ("C", 7.25)))
    def tree(depth: Int): Gen[(String, Double)] =
      if (depth == 0) leaf
      else Gen.frequency(
        2 -> leaf,
        3 -> (for {
          op <- Gen.oneOf("+", "-", "*")
          (ls, lv) <- tree(depth - 1)
          (rs, rv) <- tree(depth - 1)
        } yield (s"($ls $op $rs)", op match {
          case "+" => lv + rv; case "-" => lv - rv; case "*" => lv * rv
        })))
    val cases = Iterator.continually(tree(4).sample).flatten.take(20).toSeq
    for ((src, expected) <- cases) {
      val got = evalScalar(src, Map("A" -> 2.5, "B" -> 4.0, "C" -> 7.25))
      assert(math.abs(got - expected) <= math.abs(expected) * 1e-9 + 1e-9, s"expr $src")
    }
  }

  test("elementwise evaluation over array columns") {
    import spark.implicits._
    val df = Seq((Array(8000.0f, 100.0f, 0.0f), Array(2000.0f, 50.0f, 0.0f)))
      .toDF("B08", "B04")
    val out = df.select(compileElementwise("(B08 - B04) / (B08 + B04 + 1.)",
      Map("B08" -> col("B08"), "B04" -> col("B04"))).as("v"))
      .head().getSeq[Double](0)
    assert(math.abs(out.head - 6000.0 / 10001.0) < 1e-9)
    assert(math.abs(out(1) - 50.0 / 151.0) < 1e-9)
    assert(out(2) == 0.0)
  }

  test("clamp bounds (index_generator.py:131–135)") {
    import spark.implicits._
    val df = Seq(-20000.0, 0.0, 20000.0).toDF("v")
    val got = df.select(clamp(col("v"), -10000, 10000).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(-10000.0, 0.0, 10000.0))
  }
}
