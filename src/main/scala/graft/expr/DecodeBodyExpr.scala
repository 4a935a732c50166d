package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware HTTP body decode — the step between a raw fetch payload
  * (`binary`) and every text consumer (mainText, dedup keys, n-grams).
  * `cast("string")` decodes UTF-8 only; real crawls are ~5–10% legacy
  * encodings (ISO-8859-1, Windows-1252, GBK, Shift_JIS), and those pages
  * would otherwise mojibake straight through extraction and change their
  * dedup identity. Reference anchor: the reference delegates body decode
  * to requests (safe_request, utils.py:540–575); Common Crawl's WET
  * extraction does the same charset resolution this implements.
  *
  * Resolution order (the documented spec a replay mirrors):
  *  1. `charset=` parameter of the Content-Type header value
  *     (case-insensitive, optional quotes);
  *  2. else a `<meta … charset=…>` sniff over the first 1024 payload
  *     bytes read as ISO-8859-1 (total: every byte maps) — this catches
  *     both `<meta charset="x">` and the http-equiv form, whose content
  *     attribute also reads `charset=x`;
  *  3. else, NOTHING declared: UTF-8 when the payload validates as
  *     UTF-8 (pure ASCII included), Windows-1252 otherwise — the
  *     de-facto WET-extractor heuristic for undeclared legacy pages
  *     (bytes that break UTF-8 on such pages are overwhelmingly cp1252
  *     punctuation: curly quotes, dashes, €; cp1252 is the WHATWG
  *     default and a superset of ISO-8859-1 on the 0x80–0x9F gap, so it
  *     also covers undeclared latin-1). The validity scan is a single
  *     byte pass, paid only by undeclared non-ASCII pages.
  * A DECLARED-but-unknown/illegal name still falls back to UTF-8, not
  * the heuristic, rather than failing the row (a crawler must not die
  * on `charset=klingon`). Malformed and unmappable byte sequences
  * decode to U+FFFD (CodingErrorAction.REPLACE) — salvage semantics,
  * consistent with [[graft.sources.Warc]]'s entity de-framing.
  *
  * Scale shape: scalar per-row expression, decode runs scan-side where
  * the payload already lives; only the decoded text (usually smaller
  * than the markup) flows on. CodegenFallback: the decoder loop
  * dominates per-row dispatch, and fallback keeps the surrounding
  * projection inside whole-stage codegen.
  */
object BodyDecode {

  /** First `charset=NAME` occurrence in a header-ish string; "" if none.
    * Accepts optional quotes and the token charset alphabet
    * (RFC 2978 names are ASCII letters/digits/punct subset). */
  private val CharsetParam =
    java.util.regex.Pattern.compile(
      "(?i)charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9][A-Za-z0-9._:\\-]*)")

  /** `<meta … charset=…>` within a prefix (the http-equiv form's content
    * attribute contains the same `charset=` token, so one pattern covers
    * both shapes). */
  private val MetaCharset =
    java.util.regex.Pattern.compile(
      "(?is)<meta\\b[^>]*charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9][A-Za-z0-9._:\\-]*)")

  private val SniffBytes = 1024

  private def charsetParamOf(s: String): String = {
    val m = CharsetParam.matcher(s)
    if (m.find()) m.group(1) else ""
  }

  /** The charset NAME the decode will use (post-resolution, canonical
    * JVM name) — exposed as its own column for auditability. */
  def resolveCharset(payload: Array[Byte], contentType: String): java.nio.charset.Charset = {
    val fromCt = charsetParamOf(if (contentType == null) "" else contentType)
    val name =
      if (fromCt.nonEmpty) fromCt
      else {
        val n = math.min(SniffBytes, payload.length)
        val prefix = new String(payload, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
        val m = MetaCharset.matcher(prefix)
        if (m.find()) m.group(1) else ""
      }
    if (name.isEmpty) {
      // undeclared: the validity heuristic, not a blind UTF-8 cast
      if (isValidUtf8(payload)) java.nio.charset.StandardCharsets.UTF_8
      else Windows1252
    } else lookup(name)
  }

  private val Windows1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Strict single-pass UTF-8 validity scan (RFC 3629 table: no
    * overlongs, no surrogates, max U+10FFFF) — the undeclared-page
    * heuristic's one extra byte pass. */
  private[graft] def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // continuation byte or overlong lead
      else {
        val (len, lo, hi) =
          if (c < 0xE0) (2, 0x80, 0xBF)
          else if (c == 0xE0) (3, 0xA0, 0xBF) // no overlong 3-byte
          else if (c == 0xED) (3, 0x80, 0x9F) // no surrogates
          else if (c < 0xF0) (3, 0x80, 0xBF)
          else if (c == 0xF0) (4, 0x90, 0xBF) // no overlong 4-byte
          else if (c < 0xF4) (4, 0x80, 0xBF)
          else if (c == 0xF4) (4, 0x80, 0x8F) // max U+10FFFF
          else return false
        if (i + len > n) return false
        val first = b(i + 1) & 0xFF
        if (first < lo || first > hi) return false
        var j = i + 2
        while (j < i + len) {
          val cc = b(j) & 0xFF
          if (cc < 0x80 || cc > 0xBF) return false
          j += 1
        }
        i += len
      }
    }
    true
  }

  private def lookup(name: String): java.nio.charset.Charset =
    if (name.isEmpty) java.nio.charset.StandardCharsets.UTF_8
    else
      try java.nio.charset.Charset.forName(name)
      catch {
        case _: java.nio.charset.IllegalCharsetNameException |
             _: java.nio.charset.UnsupportedCharsetException =>
          java.nio.charset.StandardCharsets.UTF_8
      }

  // CharsetDecoders are stateful and not thread-safe but cheap to RESET:
  // cache one per (thread, charset) so the per-row cost is the decode
  // loop, not decoder construction — a crawl partition decodes millions
  // of rows through a handful of charsets
  private val decoders =
    new ThreadLocal[java.util.HashMap[java.nio.charset.Charset,
        java.nio.charset.CharsetDecoder]] {
      override def initialValue() = new java.util.HashMap()
    }

  def decode(payload: Array[Byte], contentType: String): String = {
    val cs = resolveCharset(payload, contentType)
    val cache = decoders.get()
    var dec = cache.get(cs)
    if (dec == null) {
      dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      cache.put(cs, dec)
    }
    dec.reset()
    dec.decode(java.nio.ByteBuffer.wrap(payload)).toString
  }
}

/** decode(payload, contentType) → string under [[BodyDecode]]'s
  * resolution spec. Null payload → null; callers coalesce a nullable
  * Content-Type to "" ([[graft.functions.HtmlFunctions.decodeBody]]
  * does). */
case class DecodeBodyExpr(payload: Expression, contentType: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = payload
  override def right: Expression = contentType
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_body"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (payload.dataType == BinaryType && contentType.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"decode_body needs (binary, string), got ${payload.dataType} / ${contentType.dataType}")

  override def nullSafeEval(p: Any, ct: Any): Any =
    UTF8String.fromString(BodyDecode.decode(
      p.asInstanceOf[Array[Byte]], ct.asInstanceOf[UTF8String].toString))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(payload = newLeft, contentType = newRight)
}

/** The resolved charset's canonical JVM name, for audit columns and the
  * oracle's decision replay. */
case class BodyCharsetExpr(payload: Expression, contentType: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = payload
  override def right: Expression = contentType
  override def dataType: DataType = StringType
  override def prettyName: String = "body_charset"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (payload.dataType == BinaryType && contentType.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"body_charset needs (binary, string), got ${payload.dataType} / ${contentType.dataType}")

  override def nullSafeEval(p: Any, ct: Any): Any =
    UTF8String.fromString(BodyDecode.resolveCharset(
      p.asInstanceOf[Array[Byte]], ct.asInstanceOf[UTF8String].toString).name())

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(payload = newLeft, contentType = newRight)
}
