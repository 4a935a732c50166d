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

  // ------------------------------------------------------------- quantiles

  /** Mergeable quantile-sketch state: `levels(h)` holds items of weight
    * 2^h (unsorted), `n` the total count, `coins` the number of
    * compactions performed (its parity drives the deterministic
    * even/odd-survivor coin — no RNG, so a given reduce/merge order always
    * produces the same sketch). `len0` is the fill pointer into the
    * level-0 array, which over-allocates (capacity doubling) so reduce is
    * amortized O(1) instead of copying k doubles per row; all consumers
    * must read level 0 through [[Kll.level0]]. */
  final case class Kll(levels: Array[Array[Double]], n: Long, coins: Long,
                       len0: Int) {
    def level0: Array[Double] = java.util.Arrays.copyOf(levels(0), len0)
  }

  /** KLL-style mergeable quantile summary (Karnin-Lang-Liberty, FOCS 2016
    * — the compactor hierarchy; this uses the simpler fixed-`k`-per-level
    * variant of Manku-Rajagopalan-Lindsay). Complements the built-in
    * `percentile_approx` with what SURVEY §2.10's UDAF surface needs from
    * a sketch: an EXPORTABLE, MERGEABLE state — daily sketches roll into
    * monthly ones without re-reading the archive, the same incremental
    * shape as [[graft.meta.ScaleOps.mergeAggState]].
    *
    * Mechanics: values land in the level-0 buffer. A full level sorts and
    * keeps every second item (the survivor phase — even or odd positions by
    * the deterministic coin), promoting them one level up with doubled
    * weight. Each compaction can shift any single rank estimate by at most
    * the level's weight, so the summary holds ≤ k·H items (H ≈ log₂(n/k)
    * levels) with rank error O(n·H/k) — the spec MEASURES the realized
    * error rather than leaning on the constant. While n ≤ k nothing ever
    * compacts: the sketch is EXACT and merge-order independent, the same
    * exact-regime contract the Misra-Gries summary pins for q99.
    *
    * Scale story: an exact per-group quantile needs the group's full value
    * set on one reducer (a sort or a huge collect_list); this ships ≤ k·H
    * doubles per map-side partial regardless of group size, merges
    * associatively, and is the only way a 100 TB column gets percentiles
    * in one pass with bounded executor memory. */
  class KllAggregator(k: Int, qs: Array[Double])
      extends Aggregator[Double, Kll, Array[Double]] with Serializable {
    require(k >= 8, s"k must be >= 8, got $k")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")

    def zero: Kll = Kll(Array(new Array[Double](16)), 0L, 0L, 0)

    def reduce(buf: Kll, v: Double): Kll = {
      var sk = buf
      if (sk.len0 == sk.levels(0).length) {
        if (sk.len0 >= k) sk = compact(sk) // full AND at capacity → compact
        if (sk.len0 == sk.levels(0).length) { // still full → double capacity
          val levels = sk.levels.clone()
          levels(0) = java.util.Arrays.copyOf(levels(0),
            math.max(16, math.min(levels(0).length * 2, k + 1)))
          sk = sk.copy(levels = levels)
        }
      }
      sk.levels(0)(sk.len0) = v // in-place append: amortized O(1) per row
      sk.copy(n = sk.n + 1, len0 = sk.len0 + 1)
    }

    def merge(a: Kll, b: Kll): Kll = {
      val h = math.max(a.levels.length, b.levels.length)
      val levels = Array.tabulate(h) { i =>
        val x = if (i == 0) a.level0
        else if (i < a.levels.length) a.levels(i) else Array.empty[Double]
        val y = if (i == 0) b.level0
        else if (i < b.levels.length) b.levels(i) else Array.empty[Double]
        x ++ y
      }
      compact(Kll(levels, a.n + b.n, a.coins + b.coins, levels(0).length))
    }

    /** Compact every over-full level bottom-up (a promotion can fill the
      * level above). Survivor parity comes from the running compaction
      * counter — deterministic, engine-reproducible. */
    private def compact(sk: Kll): Kll = {
      var levels = sk.levels.clone()
      levels(0) = sk.level0 // trim slack before level arrays are rebuilt
      var coins = sk.coins
      var h = 0
      while (h < levels.length) {
        if (levels(h).length > k) {
          val sorted = levels(h).sorted
          val offset = (coins & 1L).toInt // even or odd survivors
          coins += 1
          // promote exactly half (round down) with doubled weight; an odd
          // straggler stays at this level so total weight is conserved
          val promoted = Array.tabulate(sorted.length / 2)(i => sorted(2 * i + offset))
          val straggler =
            if (sorted.length % 2 == 1 && offset == 0) Array(sorted(sorted.length - 1))
            else if (sorted.length % 2 == 1) Array(sorted(0))
            else Array.empty[Double]
          if (h + 1 >= levels.length) levels = levels :+ Array.empty[Double]
          levels(h) = straggler
          levels(h + 1) = levels(h + 1) ++ promoted
        }
        h += 1
      }
      Kll(levels, sk.n, coins, levels(0).length)
    }

    /** Weighted rank extraction matching `quantile_disc`: the smallest
      * value whose cumulative weight reaches ceil(q·n). Exact while the
      * sketch never compacted. */
    def finish(buf: Kll): Array[Double] = Sketches.kllQuantiles(buf, qs)

    def bufferEncoder: Encoder[Kll] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Kll]()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Extract quantiles from a sketch state (discrete / no interpolation —
    * DuckDB `quantile_disc` semantics, which the exact-regime oracle pins). */
  def kllQuantiles(sk: Kll, qs: Seq[Double]): Array[Double] = {
    if (sk.n == 0) return qs.map(_ => Double.NaN).toArray
    val items = for {
      h <- sk.levels.indices
      v <- (if (h == 0) sk.level0 else sk.levels(h))
    } yield (v, 1L << h)
    val sorted = items.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum
    qs.map { q =>
      // rank in [1, totalW]; ceil(q·W) with a clamp for q=0
      val rank = math.max(1L, math.ceil(q * totalW).toLong)
      var cum = 0L
      var i = 0
      var out = sorted.last._1
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= rank) { out = sorted(i)._1; found = true }
        i += 1
      }
      out
    }.toArray
  }
}
