package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * All sampling here is CONTENT-HASH based, not RNG based: the keep/drop
  * decision for a row is a pure function of the row itself, so the same
  * corpus samples identically across engines, runs, partition counts, and
  * cluster sizes — the property an auditable 100 TB data pipeline needs
  * (`rand()`-based sampling changes under AQE re-partitioning). The hash
  * is the first 24 bits of md5 ([[TextFunctions.hashBucket]]), so a DuckDB
  * oracle reproduces every decision bit-for-bit.
  */
object SamplingFunctions {

  /** A working-column name that cannot collide with the input's schema —
    * `withColumn` silently OVERWRITES an existing column of the same name
    * and the trailing `drop` would then delete the user's data. */
  /** Collision-free working-column name: `base`, or the first `base<i>`
    * absent from `df` — shared by every operator that must add-then-drop
    * a scratch column so a user column of the same name survives. */
  private[graft] def tempCol(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n)).get

  /** Uniform deterministic sample: keep ~`fraction` of rows by content
    * hash. Pure filter — no shuffle, fully pushed into the scan stage. */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
                 buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(TextFunctions.hashBucket(keyCol, buckets) <
      lit(math.round(fraction * buckets)))
  }

  /** Temperature-flattened mixing fractions: keep-fraction per stratum so
    * the sampled mix follows p_s ∝ count_s^alpha (alpha=1 → natural mix,
    * alpha=0 → uniform across strata, 0<alpha<1 → the standard flattening
    * that up-weights low-resource languages/sources). Normalized so the
    * largest resulting fraction is 1.0 (pure downsampling — a hash filter
    * cannot upsample). Feed the result to [[stratifiedHashSample]]. The
    * stratum histogram is one small aggregation; at 100 TB it's the only
    * pass before the filter. */
  def temperatureFractions(df: DataFrame, strataCol: Column,
                           alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    // cast to string (works for any stratum type) and drop NULL strata:
    // stratifiedHashSample's equality CASE can never match NULL anyway
    // (those rows keep defaultFraction)
    val counts = df.groupBy(strataCol.cast("string").as("s")).count()
      .filter(org.apache.spark.sql.functions.col("s").isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    if (counts.isEmpty) return Map.empty
    val total = counts.values.sum
    // target share ∝ count^alpha; fraction_s = targetShare_s·total / count_s,
    // scaled so max fraction = 1
    val weights = counts.map { case (s, c) => s -> math.pow(c, alpha) }
    val wTotal = weights.values.sum
    val raw = counts.map { case (s, c) => s -> (weights(s) / wTotal) * total / c }
    val mx = raw.values.max
    raw.map { case (s, f) => s -> f / mx }
  }

  /** Stratified deterministic sample: per-stratum keep fractions (e.g.
    * downsample boilerplate-heavy sources, keep all rare-language docs).
    * Strata absent from `fractions` keep `defaultFraction`. The per-row
    * decision is still a pure hash filter — the fractions map compiles to
    * a CASE chain, no join, no shuffle; at scale this is the
    * "rebalance the language mix" pass over the full corpus scan. */
  def stratifiedHashSample(df: DataFrame, strataCol: Column, keyCol: Column,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 1.0,
                           buckets: Int = 10000): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions must be in [0,1], got $f"))
    val threshold = fractions.foldLeft(lit(math.round(defaultFraction * buckets))) {
      case (acc, (stratum, f)) =>
        when(strataCol === stratum, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.filter(TextFunctions.hashBucket(keyCol, buckets) < threshold)
  }

  /** Deterministic per-group cap (domain balancing): keep at most
    * `maxPerGroup` rows per group, chosen by content-hash order — the
    * standard "no single domain dominates the corpus" guard. Hash order
    * (md5 of the key) rather than arrival order makes the kept subset a
    * uniform, engine- and partitioning-independent sample of each group;
    * ties broken by the key itself so the cut is total. `keyCol` must be
    * unique within each group (it is the row's identity — e.g. doc_id):
    * duplicate keys tie even after the tie-break, and which duplicate
    * survives a cut between them would be partition-dependent.
    *
    * Pass `orderBy` to keep the best-N by something earned upstream
    * instead of a uniform sample (e.g. PageRank descending — the
    * rank-weighted per-domain fetch budget); the ordering must stay
    * TOTAL within each group, so end it with a unique tiebreaker.
    *
    * Scale shape: ONE shuffle on the group key; within-group sort is
    * bounded by group size, and the only groups that matter are the hot
    * ones the cap exists to trim. */
  def capPerGroup(df: DataFrame, groupCol: Column, keyCol: Column,
                  maxPerGroup: Int, orderBy: Seq[Column] = Nil): DataFrame = {
    require(maxPerGroup >= 1, s"maxPerGroup must be >= 1, got $maxPerGroup")
    val order = if (orderBy.nonEmpty) orderBy
                else Seq(md5(keyCol.cast("string")).asc, keyCol.asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(order: _*)
    // collision-proof working column: a caller's own __rn must not be
    // silently clobbered (and then dropped) by the rank
    val rn = tempCol(df, "__rn")
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= maxPerGroup).drop(rn)
  }

  /** Deterministic weighted repetition — the upsampling half of corpus
    * mixing that a keep/drop hash filter cannot express. Each stratum's
    * `factor` is an epoch count: a row with factor 2.3 appears in epochs
    * 0 and 1 unconditionally and in epoch 2 iff its content hash lands in
    * the fractional 30% — so realized stratum sizes hit `count·factor` in
    * expectation with the same engine-independent determinism as
    * [[stratifiedHashSample]] (which this degenerates to for factors ≤ 1).
    * Adds an `epoch` column (0-based copy index) so downstream packing /
    * sharding can keep copies of a document apart.
    *
    * Scale shape: pure scan-side `explode(sequence(...))` — no shuffle, no
    * join; row multiplication happens inside the scan stage exactly like
    * [[TextFunctions.chunkTokens]]. Feed `factors` from
    * [[temperatureFractions]] scaled to the target epoch budget (the
    * count^α mixing weights), then [[shardByTokenBudget]] on (id, epoch)
    * for the export order. */
  def repeatWeighted(df: DataFrame, strataCol: Column, keyCol: Column,
                     factors: Map[String, Double],
                     defaultFactor: Double = 1.0,
                     buckets: Int = 10000): DataFrame = {
    (factors.values.toSeq :+ defaultFactor).foreach(f =>
      require(f >= 0 && f <= 1000, s"factors must be in [0,1000], got $f"))
    val factor = factors.foldLeft(lit(defaultFactor)) {
      case (acc, (stratum, f)) => when(strataCol === stratum, lit(f)).otherwise(acc)
    }
    val whole = floor(factor).cast("int")
    // fractional epoch by the SAME 24-bit md5 bucket as the samplers, so a
    // DuckDB oracle replays every inclusion decision bit-for-bit
    val frac = round((factor - whole) * buckets).cast("long")
    val copies = whole +
      when(TextFunctions.hashBucket(keyCol, buckets) < frac, 1).otherwise(0)
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n")
  }

  /** Deterministic global shuffle + token-budget shard assignment — the
    * training-export step that turns a curated corpus into a reproducible
    * sequence of ~`shardTokens`-token shards: rows are ordered globally by
    * `md5(seed ∥ id)` (the seeded shuffle — change the seed, get an
    * independent permutation; keep it, every engine and run agrees), then
    * cut wherever the cumulative token count crosses a shard boundary.
    * Adds a `shard` column; a row's shard is
    * `floor(tokensBefore / shardTokens)` in that global order, so every
    * shard except the last holds ≥ `shardTokens` tokens once its last doc
    * arrives, and an oversized doc overflows its own shard without
    * shifting earlier ones (same convention as [[TextFunctions.packBins]],
    * which packs per-partition; this op is its GLOBAL counterpart).
    *
    * Scale shape — a global running sum with no single-partition window:
    * rows bucket by a monotone function of the hash's 16-bit prefix, so
    * bucket order IS hash order and each bucket is a contiguous slice of
    * the global permutation. One pass computes per-bucket token totals
    * (map-side partial agg; `buckets` rows to the driver — bounded by
    * construction, like the centroid/union-find collects elsewhere in this
    * repo), the driver prefix-sums them into per-bucket offsets (a
    * broadcast-joined `buckets`-row table), and the shard id is the
    * per-bucket window cumsum plus the bucket offset. The corpus crosses
    * exactly ONE exchange (keyed on the hash bucket — the deterministic
    * shuffle itself); per-task memory is O(bucket slice), and hash buckets
    * are uniform by construction, so there is no skew to salt.
    *
    * Buckets are NOT range-partitioner ranges on purpose:
    * `repartitionByRange` samples the data to pick boundaries, so the
    * offsets job and the assignment job could see different partitionings;
    * a hash-prefix bucket is a pure function of the row and cannot drift
    * between jobs (and `ShardSpec` pins invariance to the bucket count).
    *
    * `idCol` must be unique (it seeds the permutation and breaks hash
    * ties); null or negative `tokenCol` values fail loudly rather than
    * silently corrupting every later shard boundary. */
  def shardByTokenBudget(df: DataFrame, idCol: Column, tokenCol: Column,
                         seed: String, shardTokens: Long,
                         buckets: Int = 4096,
                         keepKey: Boolean = false): DataFrame = {
    require(shardTokens >= 1, s"shardTokens must be >= 1, got $shardTokens")
    require(buckets >= 1 && buckets <= 65536,
      s"buckets must be in [1, 65536], got $buckets")
    val h = md5(concat(lit(seed), idCol.cast("string")))
    val tok = tokenCol.cast("long")
    val guarded = when(tok.isNull.or(tok < 0),
        raise_error(concat(lit("shardByTokenBudget: null or negative token count for id "),
          idCol.cast("string"))))
      .otherwise(tok)
    // monotone 16-bit-prefix bucketing: same bucket ⇒ contiguous in h order
    val work = df
      .withColumn("__h", h)
      .withColumn("__tok", guarded)
      .withColumn("__b",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") * buckets / 65536)
          .cast("int"))
    val perBucket = work.groupBy(col("__b")).agg(sum(col("__tok")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsetRows = perBucket.map { case (b, t) =>
      val o = acc; acc += t; (b, o)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(offsetRows.toDF("__b", "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h").asc, idCol.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val out = work.join(offsets, "__b")
      .withColumn("shard",
        floor((col("__off") + coalesce(sum(col("__tok")).over(w), lit(0L)))
          / shardTokens).cast("long"))
      .drop("__tok", "__b", "__off")
    if (keepKey) out.withColumnRenamed("__h", "shuffle_key")
    else out.drop("__h")
  }

  /** Materialize a sharded corpus ([[shardByTokenBudget]] output) as the
    * training-export layout: `outDir/shard=K/` parquet, ONE file per shard
    * (the unit a data loader streams), rows inside each file in `orderCols`
    * order (pass the retained `shuffle_key` — `keepKey = true` — to
    * preserve the seeded permutation; parquet keeps row order within a
    * file). Returns the export manifest — (shard, n_rows, n_files, bytes)
    * — the completeness record a resumable loader checks before training.
    *
    * Scale shape: one hash exchange on `shard` co-locates each shard in
    * one task (so exactly one file per shard — asserted from the manifest,
    * not assumed), writes go executor-side through the Hadoop FS API like
    * every sink here, and the manifest is built from a driver-side
    * directory listing bounded by the shard count (same envelope as the
    * other bounded collects in this repo) joined to a read-back count. */
  def writeShards(sharded: DataFrame, outDir: String,
                  orderCols: Seq[Column] = Nil): DataFrame = {
    require(sharded.columns.contains("shard"), "input must carry a shard column")
    sharded.repartition(col("shard"))
      .sortWithinPartitions(col("shard") +: orderCols: _*)
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "zstd").parquet(outDir)
    val spark = sharded.sparkSession
    // driver-side collect bounded by shard count: one FS list of shard dirs
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val perShard = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map { d =>
        val files = fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        (d.getPath.getName.stripPrefix("shard=").toLong,
          files.length, files.map(_.getLen).sum)
      }.toSeq
    import spark.implicits._
    val listing = perShard.toDF("shard", "n_files", "bytes")
    val counts = spark.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
    counts.join(broadcast(listing), "shard")
      .select(col("shard"), col("n_rows"), col("n_files"), col("bytes"))
  }

  /** Exact-size weighted sample WITHOUT replacement (Efraimidis-Spirakis
    * A-ES, IPL 2006): each row gets priority u^(1/w) for a uniform u; the
    * k largest priorities are a weighted sample where inclusion
    * probability tracks weight. [[repeatWeighted]] hits stratum sizes in
    * EXPECTATION; this pins the sample to exactly `k` rows with per-row
    * weights — "sample 10k docs, longer docs proportionally more likely".
    *
    * Determinism contract as everywhere in this file: u comes from the
    * 24-bit md5 of the key ((h+1)/2^24 ∈ (0,1], never 0 so ln is finite),
    * and the rank key is the monotone transform ln(u)/w (avoids pow
    * underflow for tiny weights). Same corpus + seed ⇒ same sample on any
    * engine, partitioning, or cluster size.
    *
    * Scale shape: priority is scan-side arithmetic; the top-k is
    * `TakeOrderedAndProject` — each task keeps a k-row heap, the driver
    * merges P·k rows, the corpus itself never shuffles or sorts. */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (TextFunctions.hashBucket(keyCol.cast("string"), 1 << 24)
      .cast("double") + lit(1.0)) / lit((1 << 24).toDouble)
    // ln(u) < 0, so larger weight → ratio closer to 0 → higher priority;
    // a non-positive weight would order as ±Infinity — fail loudly instead
    val w = weightCol.cast("double")
    val pri = when(w > 0, log(u) / w)
      .otherwise(raise_error(concat(lit("weightedSample: non-positive weight "), w)))
    val es = tempCol(df, "__es")
    df.withColumn(es, pri)
      .orderBy(col(es).desc, keyCol.asc)
      .limit(k)
      .drop(es)
  }

  /** Deterministic GLOBAL prefix sums in `idCol` order with NO
    * single-partition stage — the primitive behind GPT-style sequence
    * packing: every document's global token offset in the corpus's
    * id-ordered concatenation.
    *
    * A naive `sum().over(Window.orderBy(id))` converges the corpus on one
    * task; `repartitionByRange` + per-partition sums is NOT safe because
    * the range sampler re-draws boundaries per job (the exact drift
    * [[shardByTokenBudget]]'s docstring warns about). Instead:
    *
    *  1. ONE KLL sketch pass yields ≤ `buckets` id-quantile boundaries —
    *     bounded doubles to the driver, then fixed LITERALS, so the
    *     bucketing cannot drift between jobs. The sketch may be
    *     approximate at scale: boundaries only BALANCE the buckets; the
    *     offsets are exact regardless (a bucket is a contiguous id range
    *     either way).
    *  2. Per-bucket totals partial-aggregate map-side; ≤ `buckets` rows
    *     reach the driver for the exclusive cumulative sum, which
    *     returns as a literal map.
    *  3. Per-bucket windows (bounded by the bucket slice) complete the
    *     within-bucket prefix sums; offset = bucket base + local prefix.
    *
    * `idCol` values must be unique (they define the order); weights must
    * be non-negative. Same shape as [[shardByTokenBudget]] but ordered by
    * VALUE rather than seeded hash. */
  def globalOffsets(df: DataFrame, idCol: Column, weightCol: Column,
                    buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val qs = (1 until buckets).map(_.toDouble / buckets).toArray
    val kll = org.apache.spark.sql.functions.udaf(
      new Sketches.KllAggregator(16384, qs))
    val r0 = df.agg(kll(idCol.cast("double"))).head()
    val bounds =
      if (r0.isNullAt(0)) Array.empty[Double]
      else r0.getSeq[Double](0).toArray.distinct.sorted
    val w = df.select(idCol.as("id"), weightCol.cast("long").as("wt"),
      graft.expr.NativeFunctions.search_sorted(idCol.cast("double"), bounds)
        .as("bk"))
    val totals = w.groupBy(col("bk")).agg(sum(col("wt")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((0, 0L)) { case ((_, acc), (bk, t)) => (bk, acc + t) }
    val baseByBucket = totals.map(_._1).zip(bases.map(_._2)).toMap
    val offMap = map(baseByBucket.toSeq.flatMap { case (bk, base) =>
      Seq(lit(bk), lit(base)) }: _*)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bk")).orderBy(col("id"))
    w.withColumn("__cum", sum(col("wt")).over(win))
      .select(col("id"), col("wt"),
        (col("__cum") - col("wt") + element_at(offMap, col("bk"))).as("offset"))
  }

  /** GPT-style sequence packing over the id-ordered corpus concatenation:
    * per document, its global token offset and the fixed-length sequence
    * ids it lands in ([offset, offset + n) split every `seqLen` tokens —
    * documents crossing a boundary SPAN sequences, the standard
    * pretraining layout). Pure arithmetic over [[globalOffsets]]. */
  def packSequences(df: DataFrame, idCol: Column, weightCol: Column,
                    seqLen: Int, buckets: Int = 256): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    globalOffsets(df, idCol, weightCol, buckets)
      // a wt ≤ 0 row would emit last_seq < first_seq (n_seqs = 0 and
      // last_seq = -1 at offset 0) — a nonsensical packing row. Fail loudly
      // row-side: globalOffsets only documents non-negativity, and callers
      // must pre-filter empty documents rather than receive garbage
      .withColumn("wt", when(col("wt") <= 0, raise_error(concat(
          lit("packSequences requires positive token counts; got wt="),
          col("wt").cast("string"), lit(" for id="), col("id").cast("string"))))
        .otherwise(col("wt")))
      .withColumn("first_seq", floor(col("offset") / seqLen).cast("long"))
      .withColumn("last_seq",
        floor((col("offset") + col("wt") - 1) / seqLen).cast("long"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** Per-group weighted quota: exactly `k` rows from EACH group (fewer if
    * the group is smaller), weighted without replacement by the same A-ES
    * priorities as [[weightedSample]] — "10k docs per language, longer
    * docs likelier" is the fixed-budget form of corpus rebalancing that
    * fraction-based [[stratifiedHashSample]] can only hit in expectation.
    *
    * Scale shape: one exchange keyed on the group (the window's
    * partitioning); the rank is a per-group sort of priority scalars, and
    * [[capPerGroup]]'s note applies verbatim — the window sorts only
    * within groups, never globally. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: Column, keyCol: Column,
                             weightCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (TextFunctions.hashBucket(keyCol.cast("string"), 1 << 24)
      .cast("double") + lit(1.0)) / lit((1 << 24).toDouble)
    val w = weightCol.cast("double")
    val pri = when(w > 0, log(u) / w)
      .otherwise(raise_error(concat(
        lit("weightedSamplePerGroup: non-positive weight "), w)))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(pri.desc, keyCol.asc)
    val rn = tempCol(df, "__rn")
    df.withColumn(rn, row_number().over(win))
      .filter(col(rn) <= k).drop(rn)
  }
}
