package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: overlapping windows, short tail, empty text") {
    val df = Seq(
      (1L, "a b c d e f g"), // 7 tokens, size 3 step 2 → starts 0,2,4,6
      (2L, "x"),
      (3L, "   ")
    ).toDF("id", "text")
    val out = df.select($"id", T2.chunkTokens($"text", 3, 1).as("c"))
      .select($"id", explode($"c").as("ch"))
      .select($"id", $"ch.chunk_idx", $"ch.chunk_text")
      .as[(Long, Int, String)].collect().toSet
    assert(out === Set(
      (1L, 0, "a b c"), (1L, 1, "c d e"), (1L, 2, "e f g"), (1L, 3, "g"),
      (2L, 0, "x")))
    // chunks cover every token: reassembling chunk starts reproduces text
    val n = df.filter($"id" === 3L)
      .select(size(T2.chunkTokens($"text", 3, 1))).as[Int].head()
    assert(n === 0)
  }

  test("chunkTokens rejects bad params") {
    intercept[IllegalArgumentException](T2.chunkTokens(lit("a"), 0, 0))
    intercept[IllegalArgumentException](T2.chunkTokens(lit("a"), 4, 4))
  }

  test("packBins: cumulative-before assignment, per-partition independence") {
    val df = Seq(
      // part A: sizes 600,600,600,600 target 1000 → bins 0,0,1,1
      ("A", 1L, 600), ("A", 2L, 600), ("A", 3L, 600), ("A", 4L, 600),
      // part B: oversized doc overflows its own bin without shifting others
      ("B", 1L, 2500), ("B", 2L, 100)
    ).toDF("part", "id", "n")
    val out = df.withColumn("bin",
        T2.packBins($"n", 1000, Seq($"part"), Seq($"id")))
      .select($"part", $"id", $"bin").as[(String, Long, Long)].collect().toSet
    assert(out === Set(
      ("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 1L), ("A", 4L, 1L),
      ("B", 1L, 0L), ("B", 2L, 2L)))
  }

  test("stratifiedHashSample is deterministic and respects fractions") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val s1 = SamplingFunctions.stratifiedHashSample(
      docs, $"lang", $"text", Map("en" -> 0.5), defaultFraction = 0.0)
    val s2 = SamplingFunctions.stratifiedHashSample(
      docs.repartition(7), $"lang", $"text", Map("en" -> 0.5), defaultFraction = 0.0)
    // identical keep-set regardless of partitioning (rand() would differ)
    assert(s1.select("doc_id").exceptAll(s2.select("doc_id")).count() === 0)
    assert(s1.count() === s2.count())
    // only the sampled stratum survives a 0.0 default
    assert(s1.select("lang").distinct().as[String].collect().toSet === Set("en"))
    val en = docs.filter($"lang" === "en").count()
    val kept = s1.count()
    assert(kept > 0 && kept < en, s"expected 0 < $kept < $en")
  }

  test("temperatureFractions: alpha=1 natural, alpha=0 uniform-ish, flattening in between") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val natural = SamplingFunctions.temperatureFractions(docs, $"lang", alpha = 1.0)
    assert(natural.values.forall(f => math.abs(f - 1.0) < 1e-9),
      "alpha=1 keeps the natural mix (all fractions 1)")
    val counts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val biggest = counts.maxBy(_._2)._1
    val smallest = counts.minBy(_._2)._1
    val flat = SamplingFunctions.temperatureFractions(docs, $"lang", alpha = 0.0)
    // uniform target: the biggest stratum is downsampled hardest
    assert(flat(biggest) < flat(smallest))
    assert(math.abs(flat(smallest) - 1.0) < 1e-9)
    // sampled mix approaches uniform: expected kept counts equal across strata
    val kept = counts.map { case (s, c) => c * flat(s) }
    assert(kept.max / kept.min < 1.0001)
    // half-temperature sits between
    val half = SamplingFunctions.temperatureFractions(docs, $"lang", alpha = 0.5)
    assert(half(biggest) > flat(biggest) && half(biggest) < 1.0)
  }

  test("temperatureFractions handles non-string strata and empty input") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("src_num", abs(hash($"source")) % 5) // int strata column
    val f = SamplingFunctions.temperatureFractions(docs, $"src_num", alpha = 0.5)
    assert(f.nonEmpty && f.keys.forall(_.forall(_.isDigit)))
    assert(SamplingFunctions.temperatureFractions(
      docs.filter(lit(false)), $"src_num", 0.5) === Map.empty)
  }

  test("hashSample fraction 1.0 keeps everything, 0.0 keeps nothing") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(SamplingFunctions.hashSample(docs, $"text", 1.0).count() === docs.count())
    assert(SamplingFunctions.hashSample(docs, $"text", 0.0).count() === 0)
  }

  test("property: chunkTokens covers every token with the declared overlap") {
    import org.scalacheck.Gen
    val word = Gen.choose('a', 'z').flatMap(c => Gen.choose(1, 5)
      .map(len => c.toString * len))
    val gen = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, word)
      size <- Gen.choose(2, 8)
      overlap <- Gen.choose(0, size - 1)
    } yield (ws, size, overlap)
    val cases = Iterator.continually(gen.sample).flatten.take(25).toSeq
    for ((ws, size, overlap) <- cases) {
      val text = ws.mkString(" ")
      val chunks = Seq(text).toDF("t")
        .select(T2.chunkTokens($"t", size, overlap).as("c"))
        .select(explode($"c").as("ch")).select($"ch.chunk_text")
        .as[String].collect().toSeq.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      if (ws.isEmpty) assert(chunks.isEmpty)
      else {
        // full coverage, in order, with the declared overlap between chunks
        val reassembled = chunks.head ++ chunks.tail.flatMap(_.drop(overlap))
        assert(reassembled === ws, s"coverage broken for size=$size overlap=$overlap")
        assert(chunks.forall(_.length <= size))
      }
    }
  }

  test("property: packBins is monotone and respects the budget+overflow bound") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(1, 30)
      sizes <- Gen.listOfN(n, Gen.choose(1, 500))
      target <- Gen.choose(100, 1000)
    } yield (sizes, target)
    val cases = Iterator.continually(gen.sample).flatten.take(25).toSeq
    for ((sizes, target) <- cases) {
      val rows = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val out = rows.toDF("id", "n")
        .withColumn("bin", T2.packBins($"n", target.toLong, Seq(lit(1)), Seq($"id")))
        .orderBy($"id").select($"bin", $"n").as[(Long, Int)].collect()
      // bins are nondecreasing in pack order
      assert(out.map(_._1).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
      // each bin's mass ≤ target + its last (overflowing) element
      out.groupBy(_._1).foreach { case (_, members) =>
        val mass = members.map(_._2.toLong).sum
        assert(mass <= target + members.last._2,
          s"bin mass $mass exceeds target=$target + overflow")
      }
    }
  }

  test("kmeansFit: distortion decreases monotonically-ish over iterations") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val seed = SimilarityFunctions.kmeansFit(emb, "embedding", "vec_id", k = 4,
      iterations = 1)
    val trained = SimilarityFunctions.kmeansFit(emb, "embedding", "vec_id", k = 4,
      iterations = 5)
    val d1 = SimilarityFunctions.kmeansDistortion(emb, "embedding", seed)
    val d5 = SimilarityFunctions.kmeansDistortion(emb, "embedding", trained)
    assert(d5 <= d1 + 1e-9, s"training must not increase distortion ($d1 -> $d5)")
    assert(trained.length === 4 && trained.forall(_.length === 64))
    // determinism: same corpus, same result
    val again = SimilarityFunctions.kmeansFit(emb, "embedding", "vec_id", k = 4,
      iterations = 5)
    assert(trained.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("kmeansStep: means move toward the data, one shuffle") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val c0 = Array(Array.fill(64)(0.5), Array.fill(64)(-0.5))
    val step = SimilarityFunctions.kmeansStep(emb, "embedding", c0)
    val rows = step.collect()
    assert(rows.length === 2 * 64)
    // refreshed centroid = mean of assigned vectors, verified for one cell/dim
    val expected = emb
      .select(SimilarityFunctions.ivfAssign($"embedding", c0).as("cell"),
        element_at($"embedding", 1).cast("double").as("e1"))
      .filter($"cell" === 0)
      .select(avg($"e1")).as[Double].head()
    val got = step.filter($"cell" === 0 && $"pos" === 0)
      .select($"mean_v").as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
    // plan: single hash-aggregate pair over one exchange
    val exchanges = step.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, "kmeansStep should need one shuffle (+AQE read)")
  }

  test("repeatedSpans: hand-checked islands, cross-doc repeats, reference equivalence") {
    // doc 1 and 2 share an 8-token run ("one .. eight") at DIFFERENT
    // offsets; doc 3 is clean. Only the shared run's windows mark.
    val shared = "one two three four five six seven eight"
    val d1 = s"$shared tail1 tail2 tail3"
    val d2 = s"head1 head2 $shared other tokens here now"
    val d3 = "totally different words with no repeats at all present"
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = DedupFunctions.repeatedSpans(df, "text", "doc_id", 4)
      .as[(Long, Int, Int, Long)].collect().toSet
    // L=4: the shared 8 tokens give window starts 0..4 in doc1 (5 windows,
    // span [0, 8)) and 2..6 in doc2 (span [2, 10))
    assert(got === Set((1L, 0, 8, 5L), (2L, 2, 10, 5L)), s"got $got")

    // within-ONE-doc repetition also marks (the run appears twice)
    val rep = Seq((9L, s"$shared filler $shared")).toDF("doc_id", "text")
    val gotRep = DedupFunctions.repeatedSpans(rep, "text", "doc_id", 4)
      .as[(Long, Int, Int, Long)].collect()
    assert(gotRep.nonEmpty && gotRep.forall(_._1 == 9L))

    // reference equivalence on the real corpus: a driver-side replay of
    // the same definition (window digests -> counts -> island merge)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val L = 8
    val wins = docs.flatMap { case (id, text) =>
      val tk = text.trim.split("\\s+").filter(_.nonEmpty)
      if (tk.length < L) Nil
      else (0 to tk.length - L).map(i => (id, i, tk.slice(i, i + L).mkString(" ")))
    }
    val cnt = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = wins.filter(w => cnt(w._3) >= 2)
      .groupBy(_._1).flatMap { case (id, ws) =>
        val starts = ws.map(_._2).sorted
        val islands = starts.foldLeft(List.empty[List[Int]]) {
          case (Nil, i) => List(List(i))
          case (cur :: rest, i) =>
            if (i - cur.head > L) List(i) :: cur :: rest
            else (i :: cur) :: rest
        }
        islands.map(isl => (id, isl.min, isl.max + L, isl.size.toLong))
      }.toSet
    val gotReal = DedupFunctions.repeatedSpans(
        spark.read.parquet(s"$sf0001/documents.parquet"), "text", "doc_id", L)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(gotReal === expected)
    assert(gotReal.nonEmpty, "fixture should contain planted repeats")
  }

  test("cutRepeatedSpans: first occurrence survives verbatim, later copies lose the region") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val shared = "one two three four five six seven eight"
    val d1 = s"$shared tail1 tail2 tail3"          // canonical (doc 1 < doc 2)
    val d2 = s"head1 head2 $shared other tokens here now"
    val d3 = "totally different words with no repeats at all present"
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = DedupFunctions.cutRepeatedSpans(df, "text", "doc_id", 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 holds the canonical occurrence — nothing dropped
    assert(got(1L) === ((11L, 0L, md5hex(d1))))
    // doc 2 loses exactly the 8 shared tokens; the rest survives in order
    assert(got(2L) === ((14L, 8L, md5hex("head1 head2 other tokens here now"))))
    // untouched doc: identity
    assert(got(3L) === ((9L, 0L, md5hex(d3))))

    // within-document repeat: the EARLIER position is canonical
    val rep = Seq((9L, s"$shared filler $shared")).toDF("doc_id", "text")
    val gotRep = DedupFunctions.cutRepeatedSpans(rep, "text", "doc_id", 4)
      .as[(Long, Long, Long, String)].collect().head
    assert(gotRep._3 === 8L, s"the second copy must be cut, got $gotRep")
    assert(gotRep._4 === md5hex(s"$shared filler"))

    // exact duplicate doc: fully cut, empty-string digest
    val dup = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val gotDup = DedupFunctions.cutRepeatedSpans(dup, "text", "doc_id", 4)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(gotDup(1L)._3 === 0L)
    assert(gotDup(2L)._3 === 8L && gotDup(2L)._4 === md5hex(""))

    // corpus invariants: detection and removal agree — every doc with a
    // repeated span drops tokens; kept+dropped == total; clean text of
    // untouched docs hashes to the original
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val spans = DedupFunctions.repeatedSpans(docs, "text", "doc_id", 8)
      .select($"doc_id").distinct().as[Long].collect().toSet
    val cut = DedupFunctions.cutRepeatedSpans(docs, "text", "doc_id", 8)
      .as[(Long, Long, Long, String)].collect()
    assert(cut.forall(r => r._3 >= 0 && r._3 <= r._2))
    val touchedDocs = cut.filter(_._3 > 0).map(_._1).toSet
    // cut docs ⊆ span docs (a doc can carry only canonical occurrences —
    // it has spans but loses nothing)
    assert(touchedDocs.subsetOf(spans), "cut docs must all carry repeated spans")
    assert(touchedDocs.nonEmpty)
    val untouched = cut.filter(_._3 == 0).map(_._1).toSet
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    cut.filter(r => untouched(r._1)).take(50).foreach { r =>
      val norm = texts(r._1).trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(r._4 === md5hex(norm), s"untouched doc ${r._1} must hash to its own text")
    }
  }

  test("cutAgainstIndex ≡ full cut over corpus∪batch restricted to the batch (corpus precedence)") {
    val shared = "one two three four five six seven eight"
    // corpus ids < batch ids so union-cut canonical order = corpus precedence
    val corpus = Seq(
      (1L, s"$shared corpus tail words here"),
      (2L, "unrelated corpus content entirely fresh")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"batch head $shared batch tail"),        // indexed region → cut
      (11L, "brand new batch words nothing repeated"), // untouched
      (12L, "dup dup2 dup3 dup4 filler dup dup2 dup3 dup4"), // batch-internal keep-first
      (13L, "dup dup2 dup3 dup4 second batch doc")).toDF("doc_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-widx").toString
    DedupFunctions.writeWindowIndex(corpus, "text", "doc_id", L = 4, idxDir)
    val inc = DedupFunctions.cutAgainstIndex(spark, batch, "text", "doc_id", L = 4, idxDir)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val full = DedupFunctions.cutRepeatedSpans(corpus.unionByName(batch),
        "text", "doc_id", L = 4)
      .as[(Long, Long, Long, String)].collect()
      .filter(_._1 >= 10L).map(r => r._1 -> r).toMap
    assert(inc === full,
      "incremental cut must equal the union cut on batch docs")
    // semantics spot checks: the indexed region is gone even though the
    // batch occurrence is the batch's FIRST sighting of it
    assert(inc(10L)._3 === 8L)
    assert(inc(11L)._3 === 0L)
    // batch-internal repeat of an UNindexed window keeps its first copy
    assert(inc(12L)._3 === 4L && inc(13L)._3 === 4L)
  }

  test("property: cutAgainstIndex ≡ full union cut for random corpora and batches") {
    import org.scalacheck.Gen
    // tiny alphabet forces window collisions within and across the sides
    val word = Gen.oneOf("a", "b", "c")
    val doc = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = for {
      nCorpus <- Gen.choose(0, 5)
      nBatch <- Gen.choose(1, 5)
      corpus <- Gen.listOfN(nCorpus, doc)
      batch <- Gen.listOfN(nBatch, doc)
    } yield (corpus, batch)
    org.scalacheck.Prop.forAll(gen) { case (corpusTexts, batchTexts) =>
      // corpus ids strictly below batch ids = corpus precedence
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val idxDir = java.nio.file.Files.createTempDirectory("graft-widx-prop").toString
      DedupFunctions.writeWindowIndex(corpus, "text", "doc_id", L = 2, idxDir)
      val inc = DedupFunctions.cutAgainstIndex(spark, batch, "text", "doc_id", 2, idxDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val full = DedupFunctions.cutRepeatedSpans(corpus.unionByName(batch),
          "text", "doc_id", L = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .filter(_._1 >= 100L).toSet
      inc == full
    }.check(org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25))
  }

  test("viral-digest skew: hot digests take the salted join; semantics salt-invariant") {
    // every viral doc is 100 copies of one token = 97 windows of ONE
    // digest carrying ~96% of all join rows — the regime where AQE's
    // OptimizeSkewedJoin is structurally blind (the count side is an
    // aggregate, not a bare shuffle stage, so the rule never matches;
    // verified before the salted join existed: the plan read
    // `AQEShuffleRead coalesced`, never `skew=true`).
    val boiler = Seq.fill(100)("b0").mkString(" ")
    val docs = (0 until 1100).map { i =>
      (i.toLong, if (i % 11 == 0) s"u${i}_0 u${i}_1 u${i}_2 u${i}_3"
        else boiler)
    }.toDF("doc_id", "text")
    def run(hotT: Long, salts: Int) =
      DedupFunctions.repeatedSpans(docs, "text", "doc_id", L = 4,
          hotThreshold = hotT, salts = salts)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toSet
    val gateKey = "graft.substring.skewGateBytes"
    // baseline: the plan-stats gate keeps tiny corpora on the plain join
    val cold16 = run(1000L, 16)
    spark.conf.set(gateKey, "0") // force the scale path for the fixture
    try {
      // salting is a pure partitioning choice: output identical whether
      // the digest routes hot (threshold 1k) or cold (default 100k), at
      // any salt count, and identical to the small-input plain join
      val hot8 = run(1000L, 8)
      assert(hot8 === cold16, "the salted path must equal the plain join")
      assert(hot8 === run(100000L, 16), "hot routing must not change results")
      assert(hot8 === run(1000L, 3), "salt count must not change results")
      assert(hot8.size >= 1000, s"fixture sanity: every viral doc must span")
      // and the mechanism is in the plan: with the digest hot, the join is
      // keyed (g, __salt) — the viral digest's rows spread over the salt
      // sub-keys by construction instead of converging on one task
      val plan = DedupFunctions.repeatedSpans(docs, "text", "doc_id", L = 4,
          hotThreshold = 1000L, salts = 8)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("__salt"),
        s"hot path must join on the salted key:\n$plan")
      // the cut twin rides the same machinery — equality across routings
      val cutHot = DedupFunctions.cutRepeatedSpans(docs, "text", "doc_id", L = 4,
        hotThreshold = 1000L, salts = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      spark.conf.unset(gateKey)
      val cutCold = DedupFunctions.cutRepeatedSpans(docs, "text", "doc_id", L = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(cutHot === cutCold, "cut results must be salt-invariant")
    } finally spark.conf.unset(gateKey)
  }

  test("globalOffsets: exact id-ordered prefix sums, invariant to buckets and partitioning") {
    val rnd = new scala.util.Random(7)
    // non-dense, shuffled ids with skewed weights — the general case
    val rows = rnd.shuffle((0 until 5000).map(i => (i.toLong * 7 + 3, 1L + rnd.nextInt(200))))
    val df = rows.toDF("id", "w")
    var acc = 0L
    val exp = rows.sortBy(_._1).map { case (id, w) =>
      val o = acc; acc += w; (id, o)
    }.toMap
    def run(buckets: Int, parts: Int) =
      SamplingFunctions.globalOffsets(df.repartition(parts), col("id"), col("w"),
          buckets = buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val base = run(256, 32)
    assert(base === exp, "offsets must equal the sequential prefix sum")
    // bucket count and input partitioning are pure partitioning choices
    assert(run(8, 5) === exp)
    assert(run(13, 1) === exp)
  }

  test("packSequences rejects non-positive weights loudly, not with n_seqs = 0 garbage") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("id", "w")
    val e = intercept[Exception] {
      SamplingFunctions.packSequences(df, col("id"), col("w"), seqLen = 4)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("positive token counts")),
      s"expected the packSequences guard, got: ${messages(e).mkString(" | ")}")
    // the guard changes nothing for all-positive input
    val ok = SamplingFunctions.packSequences(
        Seq((1L, 5L), (2L, 3L)).toDF("id", "w"), col("id"), col("w"), seqLen = 4)
      .orderBy(col("id"))
      .select("id", "first_seq", "last_seq", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ok.toSeq === Seq((1L, 0L, 1L, 2L), (2L, 1L, 1L, 1L)))
  }

  test("property: dedupSpans keeps exactly the first occurrence of every span, in doc order") {
    import org.scalacheck.Gen
    // tiny alphabet forces span collisions across documents
    val word = Gen.oneOf("a", "b", "c")
    val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = for {
      nDocs <- Gen.choose(1, 8)
      texts <- Gen.listOfN(nDocs, doc)
      k <- Gen.choose(1, 4)
    } yield (texts, k)
    val cases = Iterator.continually(gen.sample).flatten.take(20).toSeq
    for ((texts, k) <- cases) {
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = DedupFunctions.dedupSpans(rows.toDF("doc_id", "text"), "text", "doc_id", k)
        .as[(Long, String)].collect().toMap
      // driver-side reference: first-occurrence filter over (doc, span idx) order
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = rows.flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        val spans = toks.grouped(k).map(_.mkString(" ")).toSeq
        val kept = spans.filter(s => seen.add(s))
        if (kept.isEmpty) None else Some(id -> kept.mkString(" "))
      }.toMap
      assert(got === expected, s"k=$k texts=$texts")
    }
  }

  test("property: decontaminate output shares no n-gram with the benchmark; drops are minimal") {
    import org.scalacheck.Gen
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = for {
      corpus <- Gen.listOfN(8, doc)
      bench <- Gen.listOfN(2, doc)
      n <- Gen.choose(2, 3)
    } yield (corpus, bench, n)
    def grams(t: String, n: Int): Set[String] = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Set.empty
      else toks.sliding(n).map(_.mkString(" ")).toSet
    }
    val cases = Iterator.continually(gen.sample).flatten.take(20).toSeq
    for ((corpus, bench, n) <- cases) {
      val rows = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val benchGrams = bench.flatMap(grams(_, n)).toSet
      val kept = DedupFunctions.decontaminate(
          rows.toDF("doc_id", "text"),
          bench.toDF("text"), "text", "doc_id", n)
        .as[(Long, String)].collect().toMap
      val expected = rows.filter { case (_, t) => grams(t, n).intersect(benchGrams).isEmpty }
      assert(kept.keySet === expected.map(_._1).toSet, s"n=$n corpus=$corpus bench=$bench")
    }
  }

  test("repeatWeighted: exact copy count per row — floor(f) + fractional hash inclusion") {
    import java.security.MessageDigest
    def hb(s: String, buckets: Int): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    val rows = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    val factors = Map("a" -> 2.3, "b" -> 0.5) // c keeps default 1.0
    val out = SamplingFunctions.repeatWeighted(
        rows.toDF("doc_id", "s"), col("s"), col("doc_id").cast("string"),
        factors, defaultFactor = 1.0, buckets = 100)
      .groupBy(col("doc_id")).agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.max(col("epoch")).as("mx"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, s) =>
      val f = factors.getOrElse(s, 1.0)
      val expect = f.toInt + (if (hb(id.toString, 100) < math.round((f - f.toInt) * 100)) 1 else 0)
      val got = out.get(id).map(_._1).getOrElse(0L)
      assert(got === expect.toLong, s"id=$id stratum=$s")
      if (expect > 0) assert(out(id)._2 === expect - 1, s"epoch index id=$id") // dense 0-based epochs
    }
  }

  test("weightedSample: exact size, reference-exact selection, weight-tilted, plan is top-k") {
    import java.security.MessageDigest
    def u24(s: String): Double = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      (java.lang.Long.parseLong(hex, 16) + 1).toDouble / (1 << 24)
    }
    // two strata: 500 heavy (w=50) + 500 light (w=1) rows
    val rows = (1L to 1000L).map(i => (i, if (i <= 500) 50.0 else 1.0))
    val df = rows.toDF("doc_id", "w")
    val got = SamplingFunctions.weightedSample(df, col("doc_id"), col("w"), 200)
      .as[(Long, Double)].collect().toSet
    assert(got.size === 200)
    // A-ES reference: top-200 by ln(u)/w desc — selection must be EXACT
    val expected = rows.sortBy { case (id, w) => (-math.log(u24(id.toString)) / w, id) }
      .take(200).toSet
    assert(got === expected)
    // partition-invariant (the determinism contract of this file)
    val got7 = SamplingFunctions.weightedSample(
        df.repartition(7), col("doc_id"), col("w"), 200)
      .as[(Long, Double)].collect().toSet
    assert(got7 === got)
    // 50x weight must dominate the sample (~99% heavy in expectation)
    val heavy = got.count(_._2 == 50.0)
    assert(heavy > 150, s"heavy stratum got only $heavy of 200")
    // scale shape: a per-task heap, not a global sort
    val plan = SamplingFunctions.weightedSample(df, col("doc_id"), col("w"), 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // non-positive weight fails loudly instead of sorting as +-Infinity
    val err = intercept[Exception] {
      SamplingFunctions.weightedSample(
        Seq((1L, 0.0)).toDF("doc_id", "w"), col("doc_id"), col("w"), 1).collect()
    }
    assert(err.getMessage.contains("non-positive weight"))
  }

  test("weightedSamplePerGroup: exact quota per group, reference-exact, small groups whole") {
    import java.security.MessageDigest
    def u24(s: String): Double = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      (java.lang.Long.parseLong(hex, 16) + 1).toDouble / (1 << 24)
    }
    // group g0: 100 rows, g1: 100 rows, g2: only 3 rows (below quota)
    val rows = (1L to 203L).map { i =>
      val g = if (i <= 100) "g0" else if (i <= 200) "g1" else "g2"
      (g, i, (i % 7 + 1).toDouble)
    }
    val df = rows.toDF("g", "id", "w")
    val got = SamplingFunctions.weightedSamplePerGroup(
        df.repartition(5), col("g"), col("id"), col("w"), 10)
      .as[(String, Long, Double)].collect()
    val byG = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG("g0").size === 10 && byG("g1").size === 10)
    assert(byG("g2") === Set(201L, 202L, 203L), "small groups survive whole")
    // reference: per-group top-10 by the A-ES priority
    val expected = rows.groupBy(_._1).flatMap { case (_, members) =>
      members.sortBy { case (_, id, w) => (-math.log(u24(id.toString)) / w, id) }
        .take(10)
    }.map(r => (r._1, r._2)).toSet
    assert(got.map(r => (r._1, r._2)).toSet === expected)
  }

  test("repeatWeighted: zero shuffle — the multiplication stays in the scan stage") {
    val df = SamplingFunctions.repeatWeighted(
      (1L to 50L).map(i => (i, "x")).toDF("doc_id", "s"),
      col("s"), col("doc_id").cast("string"), Map("x" -> 3.5), 1.0, 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("property: capPerGroup keeps the md5-smallest N ids of each group exactly") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = (1L to 60L).map(i => (s"g${i % 3}", i))
    val kept = SamplingFunctions.capPerGroup(
        rows.toDF("source", "doc_id"), col("source"), col("doc_id"), 4)
      .as[(String, Long)].collect().toSet
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, members) =>
      members.sortBy { case (_, id) => (md5hex(id.toString), id) }.take(4)
    }.toSet
    assert(kept === expected)
  }

  // ---- log-structured window index: append / merged read / compaction ----

  test("cut-after-append ≡ cutting against the full-union index (two batches)") {
    val shared = "one two three four five six seven eight"
    val corpus = Seq((1L, s"$shared corpus tail words here"),
      (2L, "unrelated corpus content entirely fresh")).toDF("doc_id", "text")
    val batch1 = Seq((10L, "day one adds alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // batch2 repeats batch1's text (only visible through the APPENDED
    // segment) and the corpus text (only visible through the base segment)
    val batch2 = Seq(
      (20L, "day two alpha beta gamma delta epsilon zeta trailing"),
      (21L, s"quoting $shared again"),
      (22L, "nothing shared at all by design")).toDF("doc_id", "text")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap

    val logDir = java.nio.file.Files.createTempDirectory("graft-widx-log").toString
    DedupFunctions.writeWindowIndex(corpus, "text", "doc_id", L = 4, logDir)
    val cut1 = collect(DedupFunctions.cutAgainstIndex(spark, batch1,
      "text", "doc_id", L = 4, logDir))
    DedupFunctions.appendToWindowIndex(batch1, "text", "doc_id", L = 4, logDir)
    val cut2 = collect(DedupFunctions.cutAgainstIndex(spark, batch2,
      "text", "doc_id", L = 4, logDir))

    // reference: one single-segment index over corpus ∪ batch1
    val fullDir = java.nio.file.Files.createTempDirectory("graft-widx-full").toString
    DedupFunctions.writeWindowIndex(corpus.unionByName(batch1),
      "text", "doc_id", L = 4, fullDir)
    val cutFull = collect(DedupFunctions.cutAgainstIndex(spark, batch2,
      "text", "doc_id", L = 4, fullDir))
    assert(cut2 === cutFull,
      "multi-segment cut must equal the single-segment union cut")
    assert(cut1(10L)._3 === 0L, "batch1 shares nothing with the corpus")
    assert(cut2(20L)._3 > 0L, "batch2 must lose the region indexed by the append")
    assert(cut2(21L)._3 > 0L, "batch2 must lose the region indexed by the base write")
    assert(cut2(22L)._3 === 0L)
  }

  test("readWindowIndex merges segments by summing counts; compaction preserves it atomically") {
    val docs1 = Seq((1L, "w1 w2 w3 w1 w2 w3")).toDF("doc_id", "text") // each L=2 window twice... compute below
    val docs2 = Seq((2L, "w1 w2 extra tokens")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-widx-gen").toString
    DedupFunctions.writeWindowIndex(docs1, "text", "doc_id", L = 2, dir)
    DedupFunctions.appendToWindowIndex(docs2, "text", "doc_id", L = 2, dir)
    def snapshot() = DedupFunctions.readWindowIndex(spark, dir)
      .collect().map(r => (new String(java.util.Base64.getEncoder.encode(
        r.getAs[Array[Byte]](0))), r.getLong(1))).toMap
    val merged = snapshot()
    // "w1 w2" occurs twice in doc1 and once in doc2 → summed across segments
    val union = docs1.unionByName(docs2)
    val refDir = java.nio.file.Files.createTempDirectory("graft-widx-ref").toString
    DedupFunctions.writeWindowIndex(union, "text", "doc_id", L = 2, refDir)
    val ref = DedupFunctions.readWindowIndex(spark, refDir)
      .collect().map(r => (new String(java.util.Base64.getEncoder.encode(
        r.getAs[Array[Byte]](0))), r.getLong(1))).toMap
    assert(merged === ref, "segment merge must equal the single-segment build")
    assert(merged.values.max >= 3L, "fixture must actually cross segments")

    // compaction publishes a NEW generation; reads are identical
    DedupFunctions.compactWindowIndex(spark, dir)
    assert(snapshot() === merged)
    val root = new java.io.File(dir)
    assert(root.listFiles().map(_.getName).toSet === Set("gen=1"),
      "old segments must be GC'd after the new generation publishes")
    // append INTO the compacted generation, compact again: generations
    // advance (gen=2), counts keep summing — and the PREVIOUS generation
    // is retained one full cycle, so a reader that resolved gen=1 just
    // before this compaction still finds its files mid-scan
    DedupFunctions.appendToWindowIndex(docs2, "text", "doc_id", L = 2, dir)
    DedupFunctions.compactWindowIndex(spark, dir)
    assert(root.listFiles().map(_.getName).toSet === Set("gen=1", "gen=2"),
      "previous complete generation must survive one compaction cycle")
    val hotKey = merged.maxBy(_._2)._1 // the "w1 w2" digest: 2 + 1 before
    assert(snapshot()(hotKey) === merged(hotKey) + 1)
    // an overlapping reader on the retained generation still scans cleanly
    assert(spark.read.parquet(s"$dir/gen=1").count() > 0)
    // the cycle closes: the NEXT compaction GCs gen=1, keeps gen=2+gen=3
    DedupFunctions.compactWindowIndex(spark, dir)
    assert(root.listFiles().map(_.getName).toSet === Set("gen=2", "gen=3"))
    assert(snapshot()(hotKey) === merged(hotKey) + 1)
  }

  test("crash-consistency: a marker-less half-written generation is invisible to readers") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-widx-crash").toString
    DedupFunctions.writeWindowIndex(docs, "text", "doc_id", L = 2, dir)
    val before = DedupFunctions.readWindowIndex(spark, dir).count()
    // simulate a compaction that died before its _SUCCESS marker: a gen
    // dir holding a parquet file with DIFFERENT (wrong) content
    val half = new java.io.File(dir, "gen=1"); half.mkdirs()
    val bogus = Seq((9L, "zz yy xx ww vv uu tt ss rr qq pp")).toDF("doc_id", "text")
    val tmpB = java.nio.file.Files.createTempDirectory("graft-widx-bogus").toString
    DedupFunctions.writeWindowIndex(bogus, "text", "doc_id", L = 2, tmpB)
    val bogusFile = new java.io.File(tmpB).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(bogusFile.toPath,
      new java.io.File(half, bogusFile.getName).toPath)
    assert(DedupFunctions.readWindowIndex(spark, dir).count() === before,
      "readers must stay on the committed layout, not the crashed generation")
    // the next compaction recovers: overwrites the debris generation from
    // the committed flat layout and GCs everything else
    DedupFunctions.compactWindowIndex(spark, dir)
    assert(DedupFunctions.readWindowIndex(spark, dir).count() === before)
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet === Set("gen=1"))
  }
}

/** Alias so the spec reads naturally next to the other function suites. */
private object T2 {
  def chunkTokens(text: org.apache.spark.sql.Column, size: Int, overlap: Int) =
    TextFunctions.chunkTokens(text, size, overlap)
  def packBins(n: org.apache.spark.sql.Column, target: Long,
               part: Seq[org.apache.spark.sql.Column],
               ord: Seq[org.apache.spark.sql.Column]) =
    TextFunctions.packBins(n, target, part, ord)
}
