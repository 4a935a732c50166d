package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al.'s classic toy corpus: low×5 lower×2 newest×6 widest×3
  private def toyCorpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
     Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
  ).toDF("text")

  test("train learns the classic merges in order on the toy corpus") {
    val merges = Bpe.train(toyCorpus, $"text", numMerges = 4)
    // es(9) -> est(9) -> lo(7) -> low(7)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("applyMerge handles overlapping pairs greedily left-to-right") {
    val df = Seq(Seq("a", "a", "a")).toDF("sym")
    val out = df.select(Bpe.applyMerge($"sym", "a", "a")).as[Seq[String]].head()
    assert(out === Seq("aa", "a"))
  }

  test("segment applies merges; learned subword count shrinks toward word count") {
    val merges = Bpe.train(toyCorpus, $"text", numMerges = 10)
    val seg = toyCorpus.select(Bpe.segment($"text", merges).as("s"))
      .as[Seq[Seq[String]]].head()
    // "newest" must contain the learned "est" unit
    assert(seg.exists(_.contains("est")) || seg.exists(_.contains("newest")))
    val df = Seq("low lower newest widest").toDF("text")
    val nChars = df.select(aggregate(TextFunctions.tokens($"text"), lit(0),
      (a, w) => a + length(w))).as[Int].head()
    val nLearned = df.select(Bpe.subwordCountLearned($"text", merges)).as[Int].head()
    val nWords = 4
    assert(nLearned < nChars, "merges must compress below character count")
    assert(nLearned >= nWords, "cannot go below one unit per word")
  }

  test("training is deterministic and distributes (real corpus slice)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val m1 = Bpe.train(docs, $"text", numMerges = 5)
    val m2 = Bpe.train(docs.repartition(7), $"text", numMerges = 5)
    assert(m1 === m2, "partitioning must not change the learned merges")
    assert(m1.length === 5)
  }
}
