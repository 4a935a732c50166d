package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketches for corpus statistics at scales where exact answers
  * stop fitting. The built-in sketch paths (`approx_count_distinct` HLL,
  * `percentile_approx`) cover cardinality and quantiles; this adds
  * frequency estimation — a count-min sketch as a typed `Aggregator`, the
  * custom-UDAF surface of SURVEY §2.10 applied to the training-pipeline
  * side.
  *
  * Scale story: exact n-gram counting (q60) shuffles one partial per
  * distinct n-gram per task — fine until the vocabulary explodes (web-scale
  * 5-grams ≫ executor memory). The sketch is a FIXED depth×width table:
  * map-side partials are merged elementwise, the shuffle carries
  * depth×width longs per task regardless of vocabulary, and the result
  * answers any point frequency query with error ≤ εN (ε = e/width) at
  * confidence 1−δ (δ = e^−depth) — overestimates only, never under.
  */
object Sketches {

  /** depth×width count table, flattened row-major. */
  type CMS = Array[Long]

  private def bucket(s: String, row: Int, width: Int): Int = {
    // xxhash-free: deterministic, engine-independent seeded FNV-1a over the
    // UTF-8 BYTES of the string, so byte-oriented ports (Go/Rust/DuckDB
    // UDFs) agree on non-ASCII input too
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0x811c9dc5 ^ (row * 0x9e3779b9)
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x01000193; i += 1 }
    math.floorMod(h, width)
  }

  /** Typed Aggregator building a count-min sketch over a string column. */
  class CountMinAggregator(depth: Int, width: Int)
      extends Aggregator[String, CMS, CMS] with Serializable {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    def zero: CMS = new Array[Long](depth * width)
    def reduce(buf: CMS, s: String): CMS = {
      if (s != null) {
        var r = 0
        while (r < depth) { buf(r * width + bucket(s, r, width)) += 1; r += 1 }
      }
      buf
    }
    def merge(a: CMS, b: CMS): CMS = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: CMS): CMS = buf
    def bufferEncoder: Encoder[CMS] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CMS]()
    def outputEncoder: Encoder[CMS] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CMS]()
  }

  /** Sketch a string column into one depth×width table (single row out). */
  def countMin(df: DataFrame, col0: Column, depth: Int = 4,
               width: Int = 1 << 14): CMS = {
    val agg = udaf(new CountMinAggregator(depth, width))
    df.select(agg(col0.cast("string")).as("cms"))
      .head().getSeq[Long](0).toArray
  }

  /** Point frequency estimate: min over the depth rows (≥ true count,
    * ≤ true count + εN w.h.p.). */
  def estimate(cms: CMS, depth: Int, width: Int, s: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      best = math.min(best, cms(r * width + bucket(s, r, width)))
      r += 1
    }
    best
  }

  /** Misra-Gries frequent-items summary as a typed Aggregator: at most `k`
    * counters regardless of key cardinality. The count-min sketch above
    * answers "how often did THIS key occur"; this answers the harder
    * streaming question "WHICH keys are frequent" without a per-key
    * groupBy. Guarantees (Misra-Gries 1982; merge rule from Agarwal et al.,
    * "Mergeable Summaries", PODS 2012): every key with true frequency
    * > N/(k+1) is present, and each reported count c satisfies
    * true − N/(k+1) ≤ c ≤ true — underestimates only, the mirror image of
    * count-min. With k ≥ distinct(keys) the summary is EXACT and
    * merge-order independent, which is what the streaming==batch
    * equivalence spec pins.
    *
    * Scale story: a windowed top-domains / top-tokens over 100 TB of
    * events cannot afford count(*) per distinct key — the shuffle carries
    * the whole vocabulary. This carries ≤ k (key, count) pairs per
    * map-side partial, merges associatively, and runs as a normal
    * streaming windowed aggregation with O(k) state per window. */
  class MisraGriesAggregator(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]]
      with Serializable {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(buf: Map[String, Long], s: String): Map[String, Long] = {
      if (s == null) buf
      else buf.get(s) match {
        case Some(c) => buf.updated(s, c + 1)
        case None if buf.size < k => buf.updated(s, 1L)
        case None => // decrement-all: the classic MG eviction step
          buf.iterator.flatMap { case (key, c) =>
            if (c > 1) Some(key -> (c - 1)) else None
          }.toMap
      }
    }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from everything and drop the
        // non-positive rest — keeps ≤ k entries and the εN error bound
        val cut = combined.valuesIterator.toArray.sorted(Ordering.Long.reverse)(k)
        combined.iterator.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None
        }.toMap
      }
    }
    def finish(buf: Map[String, Long]): Map[String, Long] = buf
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
