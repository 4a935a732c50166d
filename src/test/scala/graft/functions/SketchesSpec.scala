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

  test("kll: exact regime matches the discrete-quantile rule and is partition-invariant") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val vals = docs.select($"n_chars".cast("double").as("v"))
    val sorted = vals.as[Double].collect().sorted
    val n = sorted.length
    val qs = Array(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    // the rule the oracle pins (DuckDB quantile_disc): smallest value whose
    // cumulative count reaches ceil(q*n)
    val exact = qs.map(q => sorted(math.max(0, math.ceil(q * n).toInt - 1)))
    val kll = udaf(new Sketches.KllAggregator(65536, qs))
    for (parts <- Seq(1, 13)) {
      val got = vals.repartition(parts).agg(kll($"v").as("qs"))
        .head().getSeq[Double](0).toArray
      assert(got.toSeq === exact.toSeq, s"exact-regime mismatch at $parts partitions")
    }
  }

  test("kll: compacted regime holds a measured rank-error bound with bounded state") {
    val n = 200000
    val k = 256
    // deterministic pseudo-shuffle of 0..n-1: true rank of value v is v+1
    val vals = spark.range(n)
      .select((($"id" * 48271) % n).cast("double").as("v"))
    val agg = new Sketches.KllAggregator(k, Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
    val kll = udaf(agg)
    val got = vals.repartition(8).agg(kll($"v").as("qs")).head().getSeq[Double](0)
    val qs = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    qs.zip(got).foreach { case (q, est) =>
      // value v sits at rank v+1 in 0..n-1, so rank error is direct
      val rankErr = math.abs((est + 1) - q * n) / n
      assert(rankErr <= 0.05,
        f"q=$q: estimate $est%.0f is $rankErr%.4f of n off in rank (bound 0.05)")
    }
    // state bound: a driver-side replay of the same stream can't exceed
    // k items per level plus stragglers, H ~ log2(n/k) levels
    var sk = agg.zero
    (0 until n).foreach(i => sk = agg.reduce(sk, ((i.toLong * 48271) % n).toDouble))
    val items = sk.len0 + sk.levels.drop(1).map(_.length).sum
    val levels = sk.levels.length
    assert(levels <= math.ceil(math.log(n.toDouble / k) / math.log(2)).toInt + 2,
      s"level count $levels grew past log2(n/k)")
    assert(items <= k * (levels + 1), s"retained $items items > k*(H+1)")
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
