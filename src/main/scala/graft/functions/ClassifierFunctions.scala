package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained text-quality models for training-data curation: a multinomial
  * Naive Bayes classifier (the fastText-langid / domain-filter shape) and a
  * unigram language model with perplexity scoring (the CCNet quality-filter
  * shape). Both train with EXACT counts — no SGD, no randomness — so the
  * fitted model and every score are deterministic and replayable by a SQL
  * oracle.
  *
  * Scale design (the whole point of doing this on Spark):
  *
  *   - TRAINING is one explode + one (label, term) hash aggregation with
  *     map-side partials; the exchange carries vocabulary-sized data, not
  *     corpus-sized. Class priors / totals / vocabulary size are derived
  *     from that same aggregate (Catalyst reuses the exchange across the
  *     branches), so a 100 TB train corpus produces a model of a few
  *     hundred MB at worst — it never concentrates on the driver.
  *   - The fitted model stays a pair of DataFrames; SCORING broadcasts
  *     them and runs scan-side: explode → broadcast hash join on term →
  *     partial-aggregated (doc, label) sum. The only exchange in scoring
  *     carries one row per (doc, class) — independent of document length.
  *   - OOV terms cost nothing by construction: with Laplace smoothing the
  *     per-term contribution is log(cnt+1) − log(T_c + V), and log(0+1)=0,
  *     so unseen terms drop out of the join entirely and the closed-form
  *     `− n_tokens · log(T_c + V)` term accounts for every token. No
  *     left-join-per-token, no per-class default lookup.
  *
  * The reference has no trained filters (its quality gates are the static
  * heuristics mirrored in [[TextFunctions]]); these extend the engine along
  * the training-data-pipeline axis the driver's `documents` table exists
  * for (CCNet: Wenzek et al. 2020; fastText: Joulin et al. 2017).
  */
object ClassifierFunctions {

  /** Lowercased whitespace tokens — the shared pre-tokenizer, kept
    * RE2-compatible so the DuckDB oracle tokenizes identically. */
  private def toks(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Fitted multinomial NB model.
    *
    * @param classStats per-class row: (label, log_prior, log_denom) where
    *                   log_denom = ln(T_c + V) — the Laplace denominator
    * @param termLikelihood vocabulary-sized rows: (term, label, log_cnt1)
    *                       with log_cnt1 = ln(cnt + 1)
    */
  final case class NbModel(classStats: DataFrame, termLikelihood: DataFrame)

  /** Train multinomial Naive Bayes with add-one (Laplace) smoothing over
    * lowercased whitespace tokens. Deterministic: exact integer counts.
    *
    * score(d, c) = ln P(c) + Σ_t [ ln(cnt(t,c)+1) − ln(T_c + V) ]
    *             = log_prior(c) + Σ_{t: cnt(t,c)>0} log_cnt1(t,c)
    *               − n_tokens(d) · log_denom(c)
    */
  def trainNaiveBayes(train: DataFrame, textCol: String, labelCol: String): NbModel = {
    val termCnt = train
      .select(col(labelCol).as("label"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    // All three shapes below hang off the same (label, term) aggregate —
    // identical exchanges, so ReuseExchange evaluates the heavy explode
    // + shuffle once per job.
    val vocab = termCnt.agg(countDistinct(col("term")).as("v_size"))
    val perClassTotal = termCnt.groupBy(col("label")).agg(sum(col("cnt")).as("t_c"))
    val classDocs = train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_c"))
    val allDocs = train.agg(count(lit(1)).as("n_docs"))
    val classStats = classDocs
      .crossJoin(allDocs)
      .join(perClassTotal, "label")
      .crossJoin(vocab)
      .select(
        col("label"),
        log(col("n_c").cast("double") / col("n_docs")).as("log_prior"),
        log((col("t_c") + col("v_size")).cast("double")).as("log_denom"))
    val termLikelihood =
      termCnt.select(col("term"), col("label"), log(col("cnt") + lit(1.0)).as("log_cnt1"))
    NbModel(classStats, termLikelihood)
  }

  /** Per-(doc, class) NB log-score. Output: (idCol, label, score).
    * The model sides broadcast; the only exchange carries one row per
    * (doc, class). Zero-token documents score log_prior alone. */
  def nbScore(docs: DataFrame, model: NbModel, textCol: String, idCol: String): DataFrame = {
    val base = docs
      .select(col(idCol), size(toks(col(textCol))).cast("double").as("n_tok"))
      .crossJoin(broadcast(model.classStats))
    val matched = docs
      .select(col(idCol), explode(toks(col(textCol))).as("term"))
      .join(broadcast(model.termLikelihood), "term")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("log_cnt1")).as("s_match"))
    base
      .join(matched, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (col("log_prior") + coalesce(col("s_match"), lit(0.0))
          - col("n_tok") * col("log_denom")).as("score"))
  }

  /** Argmax over [[nbScore]] — ties break to the lexicographically first
    * label so Spark and the SQL oracle pick identically.
    * Output: (idCol, pred_label, score). */
  def nbPredict(docs: DataFrame, model: NbModel, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("label").asc)
    nbScore(docs, model, textCol, idCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("label").as("pred_label"), col("score"))
  }

  /** Fitted unigram LM: vocabulary-sized (term, log2_cnt1) plus a single
    * (log2_denom) row with log2(T + V). */
  final case class UnigramLm(termCounts: DataFrame, stats: DataFrame)

  /** Train a Laplace-smoothed unigram LM over lowercased whitespace
    * tokens: p(t) = (cnt(t)+1) / (T+V). Same exchange-reuse shape as NB
    * training, minus the class dimension. */
  def trainUnigramLm(train: DataFrame, textCol: String): UnigramLm = {
    val termCnt = train
      .select(explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
    val stats = termCnt
      .agg((sum(col("cnt")) + countDistinct(col("term"))).cast("double").as("t_plus_v"))
      .select(log2(col("t_plus_v")).as("log2_denom"))
    UnigramLm(termCnt.select(col("term"), log2(col("cnt") + lit(1.0)).as("log2_cnt1")), stats)
  }

  /** Per-document cross-entropy in bits/token under the unigram LM — the
    * CCNet-style quality signal (low bits ≈ head-like fluent text, high
    * bits ≈ OOV-heavy noise; perplexity = 2^bits).
    *
    *   H(d) = −(1/n) Σ_t log2 p(t) = log2(T+V) − (1/n) Σ_t log2(cnt(t)+1)
    *
    * OOV terms contribute log2(1) = 0 to the matched sum, so the scan-side
    * shape is the same broadcast join as [[nbScore]]. Zero-token documents
    * are excluded (entropy of nothing is undefined).
    * Output: (idCol, n_tok, bits). */
  def unigramBitsPerToken(docs: DataFrame, lm: UnigramLm, textCol: String,
                          idCol: String): DataFrame = {
    val base = docs
      .select(col(idCol), size(toks(col(textCol))).as("n_tok"))
      .filter(col("n_tok") > 0)
    val matched = docs
      .select(col(idCol), explode(toks(col(textCol))).as("term"))
      .join(broadcast(lm.termCounts), "term")
      .groupBy(col(idCol))
      .agg(sum(col("log2_cnt1")).as("s_match"))
    base
      .join(matched, Seq(idCol), "left")
      .crossJoin(broadcast(lm.stats))
      .select(col(idCol), col("n_tok"),
        (col("log2_denom")
          - coalesce(col("s_match"), lit(0.0)) / col("n_tok")).as("bits"))
  }
}
