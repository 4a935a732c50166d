package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers for the engine's native Catalyst expressions. */
object NativeFunctions {

  /** k-hash MinHash signature over word n-gram shingles (lowercase-hex md5
    * minima; identical semantics to the HOF formulation and DuckDB oracle). */
  def minhash_signature(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(text), n, k))

  /** Codegen'd dot product over two array<float|double> columns. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native 64-bit SimHash over whitespace tokens. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text)))

  /** Native distinct word n-gram shingles (first-occurrence order). */
  def word_ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(text), n))

  /** Occurrence-indexed n-gram multiset elements (`gram#k`) — set Jaccard
    * over these IS weighted/tf Jaccard (unary expansion). */
  def multiset_elems(text: Column, n: Int = 1): Column =
    ColumnBridge.column(MultisetElemsExpr(ColumnBridge.expression(text), n))

  /** k-hash MinHash signature over the occurrence-indexed multiset —
    * collision probability = WEIGHTED n-gram Jaccard. */
  def weighted_minhash_signature(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(WeightedMinHashSignatureExpr(ColumnBridge.expression(text), n, k))

  /** Native sliding L-token window md5 digests (16-byte binary each). */
  def window_digests(text: Column, l: Int): Column =
    ColumnBridge.column(WindowDigestsExpr(ColumnBridge.expression(text), l))

  /** Native 16-bit md5-based SimHash (cross-engine-reproducible). */
  def simhash_md5_16(text: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(text)))

  /** Native 64-bit DCT perceptual hash over a 32×32 luma grid
    * (array<double>, 1024 values row-major) — see [[PHash64Expr]]. */
  def phash64(grid: Column): Column =
    ColumnBridge.column(PHash64Expr(ColumnBridge.expression(grid)))

  /** Native 64-bit audio fingerprint over a 5×17 sequency-band energy
    * grid (array<bigint>, 85 values row-major) — see [[Afp64Expr]]. */
  def afp64(energies: Column): Column =
    ColumnBridge.column(Afp64Expr(ColumnBridge.expression(energies)))

  /** Intersection COUNT of two SORTED array<bigint> columns — two-pointer
    * merge in codegen, no allocation ([[SortedIntersectCountExpr]]; the
    * exact-join verify kernel). Arrays MUST be sorted ascending. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native bounded top-k (score, id) AGGREGATE: exact (score DESC,
    * id ASC) top-k per group, 2k-bounded buffer with map-side partials
    * ([[TopKPairsAgg]]). Output array<struct<score: double, id: bigint>>,
    * best first. */
  def topk_pairs(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKPairsAgg(ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())

  /** Native token-level LCS length (the integer core of ROUGE-L):
    * two-row DP over interned whitespace tokens ([[LcsTokensExpr]]). */
  def lcs_tokens(cand: Column, ref: Column): Column =
    ColumnBridge.column(LcsTokensExpr(ColumnBridge.expression(cand),
      ColumnBridge.expression(ref)))

  /** Native one-pass int8 embedding quantization →
    * struct(scale: double, q: array<byte>). */
  def quantize_int8(emb: Column): Column =
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(emb)))

  /** Codegen'd bucket index against fixed sorted cut points (count of
    * cuts ≤ v, numpy searchsorted-right). */
  def search_sorted(v: Column, cuts: Array[Double]): Column =
    ColumnBridge.column(SearchSortedExpr(ColumnBridge.expression(v), cuts))

  /** Codegen'd product-quantization encode against flattened [m][k][subDim]
    * codebooks → array<byte> of m code bytes. */
  def pq_encode(emb: Column, codebooks: Array[Float], m: Int, k: Int, subDim: Int): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(emb), codebooks, m, k, subDim))

  /** Native winnowing fingerprints: distinct sliding-window minima over
    * salted-md5 word-k-gram hashes ([[WinnowExpr]]). */
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))

  /** Codegen'd 64-bit random-hyperplane sign sketch against a flattened
    * [64][dim] plane matrix → bigint signature on the shared hamming
    * plane ([[RhpSketch64Expr]]). */
  def rhp_sketch64(emb: Column, planes: Array[Float], dim: Int): Column =
    ColumnBridge.column(RhpSketch64Expr(ColumnBridge.expression(emb), planes, dim))
}
