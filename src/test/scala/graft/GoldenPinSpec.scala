package graft

/** Golden-output pins for the two queries that legitimately have no
  * DuckDB oracle: q35_simhash folds xxhash64 and q36_fingerprint folds
  * crc32 — Spark-native hash functions with no DuckDB counterpart (their
  * md5-based twins q51/q52 ARE oracle-verified, witnessing the
  * surrounding fold logic). The pin closes the loop the oracle can't:
  * the exact output is computed once, committed, and asserted here at
  * two different shuffle parallelisms, so any change to the hash
  * semantics, the fold, or partition-order sensitivity fails loudly.
  *
  * Canonical form: rows sorted lexicographically (order-independent),
  * fields joined with '|', MD5 over the UTF-8 concatenation.
  */
class GoldenPinSpec extends SparkSpec {

  private def canonicalMd5(df: org.apache.spark.sql.DataFrame): String = {
    val rows = df.collect().map(_.toSeq.mkString("|")).sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def atParallelism[A](n: Int)(body: => A): A = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  // computed once at sf0.001 and committed; see scaladoc for the format
  private val GoldenQ35 = "f48c99a096b635ef8b9302fa40c59bb8"
  private val GoldenQ36 = "da1aeeb44732f48d8337142b27619388"

  test("q35_simhash output matches its committed golden hash at two parallelisms") {
    val got4 = canonicalMd5(SparkEntry.queries("q35_simhash")(spark, sf0001))
    val got7 = atParallelism(7)(
      canonicalMd5(SparkEntry.queries("q35_simhash")(spark, sf0001)))
    assert(got4 == got7, "q35 output is partition-order sensitive")
    assert(got4 == GoldenQ35, s"q35 golden pin mismatch: got $got4")
  }

  test("q36_fingerprint output matches its committed golden hash at two parallelisms") {
    val got4 = canonicalMd5(SparkEntry.queries("q36_fingerprint")(spark, sf0001))
    val got7 = atParallelism(7)(
      canonicalMd5(SparkEntry.queries("q36_fingerprint")(spark, sf0001)))
    assert(got4 == got7, "q36 output is partition-order sensitive")
    assert(got4 == GoldenQ36, s"q36 golden pin mismatch: got $got4")
  }
}
