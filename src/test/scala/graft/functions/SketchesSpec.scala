package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min: estimates dominate true counts, heavy hitters within eps*N") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val grams = docs.select(
      explode(graft.expr.NativeFunctions.word_ngrams($"text", 3)).as("g"))
    val exact = grams.groupBy("g").count()
      .orderBy(desc("count"), $"g").limit(50)
      .as[(String, Long)].collect()
    val n = grams.count()
    val (depth, width) = (4, 1 << 14)
    val cms = Sketches.countMin(grams, $"g", depth, width)
    val epsN = math.ceil(math.E / width * n).toLong + 1
    exact.foreach { case (g, c) =>
      val est = Sketches.estimate(cms, depth, width, g)
      assert(est >= c, s"CMS must never underestimate ($g: $est < $c)")
      assert(est <= c + epsN, s"heavy hitter $g off by ${est - c} > eps*N=$epsN")
    }
  }

  test("count-min sketch total mass equals row count per depth row") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("s")
    val (depth, width) = (3, 16)
    val cms = Sketches.countMin(df, $"s", depth, width)
    (0 until depth).foreach { r =>
      assert(cms.slice(r * width, (r + 1) * width).sum === 6L)
    }
    assert(Sketches.estimate(cms, depth, width, "a") >= 3L)
  }

  test("misra-gries: exact when k covers the key space; guarantee holds when it doesn't") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val words = docs.select(explode(TextFunctions.tokens($"text")).as("w"))
      .filter(length($"w") > 0)
    val exact = words.groupBy("w").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum

    // k >= distinct keys → the summary IS the exact count map
    val kBig = exact.size + 10
    val mgBigF = udaf(new Sketches.MisraGriesAggregator(kBig))
    val mgBig = words.select(mgBigF($"w"))
      .head().getMap[String, Long](0)
    assert(mgBig.toMap == exact, "MG with k >= distinct must be exact")

    // small k → every frequent key present, counts are lower bounds
    val k = 8
    val mgF = udaf(new Sketches.MisraGriesAggregator(k))
    val mg = words.select(mgF($"w"))
      .head().getMap[String, Long](0).toMap
    assert(mg.size <= k)
    val slack = n / (k + 1)
    exact.foreach { case (w, c) =>
      if (c > slack)
        assert(mg.contains(w), s"frequent key '$w' (true $c > N/(k+1)=$slack) must survive")
    }
    mg.foreach { case (w, est) =>
      val c = exact(w)
      assert(est <= c, s"MG must never overestimate ('$w': $est > $c)")
      assert(est >= c - slack, s"'$w' underestimated by ${c - est} > N/(k+1)=$slack")
    }
  }

  test("q99 exact-regime precondition: event_type cardinality stays under k") {
    // q99's oracle hash-matches plain per-window counts, which is only
    // guaranteed while d = distinct(event_type) ≤ k = 64 (the decrement step
    // needs a (k+1)-th distinct key to fire). Global d bounds per-window d,
    // and the generator keeps event_type categorical (d = 5 at every SF) —
    // pin it here with margin so a data change fails loudly, not as a
    // silent oracle mismatch.
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val d = events.select(countDistinct($"event_type")).as[Long].head()
    assert(d <= 64, s"q99 exact-regime broken: $d distinct event types > k=64")
    assert(d <= 32, s"margin eroded: $d distinct event types (expected ~5)")
  }

  test("built-in sketch paths: HLL cardinality and approx quantiles track exact") {
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val exactD = l.select(countDistinct($"l_partkey")).as[Long].head()
    val approxD = l.select(approx_count_distinct($"l_partkey")).as[Long].head()
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.1,
      s"HLL estimate $approxD vs exact $exactD")
    val exactP = l.select(expr("percentile(l_quantity, 0.5)")).as[Double].head()
    val approxP = l.select(percentile_approx($"l_quantity", lit(0.5), lit(10000)))
      .as[Double].head()
    assert(math.abs(approxP - exactP) <= 1.0,
      s"approx median $approxP vs exact $exactP")
  }
}
