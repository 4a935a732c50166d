package graft.functions

import graft.SparkSpec
import graft.expr.NativeFunctions
import org.apache.spark.sql.functions._

/** The weighted (multiset / term-frequency) Jaccard plane —
  * [[graft.expr.MultisetElemsExpr]], [[graft.expr.WeightedMinHashSignatureExpr]]
  * and [[DedupFunctions.weightedNeardupPairs]]: the unary expansion's
  * closed forms, set-parity between the native expression and the HOF
  * spec formulation, signature parity with a local replay, the
  * LSH-subset-of-brute property, and the plan shape. */
class WeightedMinHashSpec extends SparkSpec {
  import spark.implicits._

  /** HOF spec twin of multiset_elems: sorted tokens, occurrence index =
    * position − first position of the token (bind-once around the sorted
    * array so array_position's argument is an attribute, not a
    * re-evaluated tree). Same SET as the native encounter-order form. */
  private def elemsHof(text: org.apache.spark.sql.Column) =
    element_at(transform(array(array_sort(TextFunctions.tokens(text))), ts =>
      transform(ts, (t, i) =>
        concat(t, lit("#"), (i + 1 - array_position(ts, t)).cast("string")))), 1)

  test("weightedJaccard closed forms: repetition asymmetry, identity, disjoint") {
    val df = Seq(
      ("a a b", "a b"),       // min 1+1+... = {a:min(2,1)=1, b:1} / {a:2, b:1} = 2/3
      ("x y z", "x y z"),     // identical → 1
      ("x y", "p q"),         // disjoint → 0
      ("w w w", "w")          // tripled vs single → 1/3
    ).toDF("a", "b")
    val got = df.select(DedupFunctions.weightedJaccard(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 2.0 / 3) < 1e-12)
    assert(got(1) === 1.0)
    assert(got(2) === 0.0)
    assert(math.abs(got(3) - 1.0 / 3) < 1e-12)
  }

  test("multiset_elems: native ≡ HOF sorted formulation as sets; distinct by construction") {
    val texts = Seq("the cat the cat the", "a", "", "  ", "x  y\tx",
      "a a a a b b c") ++
      (0 until 200).map(i => (0 until (i % 11)).map(j =>
        s"w${(i * 7 + j * 3) % 5}").mkString(" "))
    val df = texts.toDF("text")
    val rows = df.select(
        array_sort(NativeFunctions.multiset_elems(col("text"))).as("n"),
        array_sort(elemsHof(col("text"))).as("h"))
      .collect()
    for (r <- rows)
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"native ${r.getSeq[String](0)} vs hof ${r.getSeq[String](1)}")
    // elements are distinct (a set): size == size of distinct
    val d = df.select(NativeFunctions.multiset_elems(col("text")).as("e"))
      .select(size(col("e")).as("n"), size(array_distinct(col("e"))).as("nd"))
      .collect()
    assert(d.forall(r => r.getInt(0) === r.getInt(1)))
  }

  test("weighted signature: native ≡ per-element HOF minima; collision ⇔ shared argmin") {
    val df = Seq("the cat the", "b a c a", "", "solo").toDF("text")
    val k = 4
    val hof = (0 until k).map(j =>
      array_min(transform(NativeFunctions.multiset_elems(col("text")),
        e => md5(concat(lit(s"s$j"), e)))))
    val rows = df.select(
        NativeFunctions.weighted_minhash_signature(col("text"), 1, k).as("n"),
        array(hof: _*).as("h"))
      .collect()
    for (r <- rows) {
      val n = r.getSeq[String](0); val h = r.getSeq[String](1)
      assert(n.length === k)
      assert(n.toList === h.toList, s"$n vs $h")
    }
    // exact duplicates share every signature component
    val sigs = Seq("p q r p", "p q r p").toDF("text")
      .select(NativeFunctions.weighted_minhash_signature(col("text"), 1, 8))
      .collect().map(_.getSeq[String](0))
    assert(sigs(0) === sigs(1))
  }

  test("n-gram elements: bigram closed forms and signature parity") {
    // "a b a b": bigrams (a b)#0, (b a)#0, (a b)#1
    // "a b":     bigrams (a b)#0  → weighted J = 1/3
    val df = Seq(("a b a b", "a b")).toDF("x", "y")
    val j = df.select(DedupFunctions.weightedJaccard(col("x"), col("y"), n = 2))
      .head().getDouble(0)
    assert(math.abs(j - 1.0 / 3) < 1e-12)
    // bigram elements: native ≡ HOF minima over explicit bigram elems
    val t = Seq("u v u v w", "u", "").toDF("text")
    val hof = (0 until 3).map(s =>
      array_min(transform(NativeFunctions.multiset_elems(col("text"), 2),
        e => md5(concat(lit(s"s$s"), e)))))
    val rows = t.select(
        NativeFunctions.weighted_minhash_signature(col("text"), 2, 3).as("n"),
        array(hof: _*).as("h"))
      .collect()
    for (r <- rows) assert(r.getSeq[String](0).toList === r.getSeq[String](1).toList)
    // sub-n docs have no elements → all-null signature
    val short = t.filter(col("text") === "u")
      .select(NativeFunctions.multiset_elems(col("text"), 2)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("weightedNeardupPairs: found ⊆ brute force with identical jaccards; exact dups always pair") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("n_chars") > 0).select(col("doc_id"), col("text"))
    val copy = docs.filter(col("doc_id") === 7)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val aug = docs.unionByName(copy)
    val lsh = DedupFunctions.weightedNeardupPairs(aug, "text", "doc_id",
        bands = 2, rowsPerBand = 2, jaccardThreshold = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute force over the same corpus
    val e = aug.select(col("doc_id"), NativeFunctions.multiset_elems(col("text")).as("es"))
    val brute = e.as("a").join(e.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        DedupFunctions.jaccardFromDistinct(col("a.es"), col("b.es")).as("j"))
      .filter(col("j") >= 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(lsh.keySet.subsetOf(brute.keySet),
      s"LSH found non-pairs: ${lsh.keySet -- brute.keySet}")
    for ((k, j) <- lsh) assert(math.abs(j - brute(k)) < 1e-12)
    // the exact duplicate shares the full signature → collides in every
    // band → guaranteed found
    assert(lsh.contains((7L, 100007L)) && lsh((7L, 100007L)) === 1.0)
  }

  test("plan: one hash exchange drives the bucket pairing, no cartesian") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = DedupFunctions.weightedNeardupPairs(docs, "text", "doc_id",
        bands = 2, rowsPerBand = 2, jaccardThreshold = 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$plan")
  }
}
