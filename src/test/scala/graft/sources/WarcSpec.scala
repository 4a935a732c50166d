package graft.sources

import graft.SparkSpec
import java.nio.charset.StandardCharsets.ISO_8859_1

/** WARC reader: layout equivalence (plain ≡ per-record gzip), HTTP message
  * split, and the four salvage paths documented on [[Warc.parseWarc]].
  * The committed fixture bytes come from the INDEPENDENT python generator
  * (scripts/gen_warc_fixture.py); q164/q165 pin the extracted digests. */
class WarcSpec extends SparkSpec {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/warc/$name")
    try in.readAllBytes() finally in.close()
  }

  private def rec(rtype: String, uri: String, ctype: String,
      block: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0\r\n")
    h ++= s"WARC-Type: $rtype\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= s"Content-Type: $ctype\r\n"
    h ++= s"Content-Length: ${block.length}\r\n\r\n"
    h.toString.getBytes(ISO_8859_1) ++ block ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  test("plain and per-record-gzip layouts parse to identical records") {
    val plain = Warc.parseWarc(resource("tiny.warc"))
    val gz = Warc.parseWarc(resource("tiny.warc.gz"))
    assert(plain.size == 20 && gz.size == 20)
    plain.zip(gz).foreach { case (a, b) =>
      assert(a.record_index == b.record_index)
      assert(a.warc_type == b.warc_type && a.target_uri == b.target_uri)
      assert(a.content_length == b.content_length)
      assert(a.http_status == b.http_status)
      assert(a.http_content_type == b.http_content_type)
      assert(java.util.Arrays.equals(a.payload, b.payload))
    }
  }

  test("HTTP response/request blocks split into status, type, body") {
    val rs = Warc.parseWarc(resource("tiny.warc"))
    val pageA = rs(2)
    assert(pageA.http_status == 200)
    assert(pageA.http_content_type == "text/html; charset=utf-8")
    // body excludes the HTTP headers: content_length is the WHOLE block
    assert(pageA.payload.length < pageA.content_length)
    assert(new String(pageA.payload, ISO_8859_1).startsWith("<!DOCTYPE html>"))
    val req = rs(1)
    assert(req.warc_type == "request" && req.http_status == -1)
    assert(req.payload.isEmpty) // GET request: headers only, empty body
    val info = rs.head
    assert(info.warc_type == "warcinfo" && info.http_status == -1)
    assert(info.payload.length == info.content_length) // non-HTTP: raw block
  }

  test("salvage: trailing garbage ends parse with records read so far") {
    val good = rec("response", "http://x/a", "text/plain", "hello".getBytes)
    val bytes = good ++ "NOT A WARC VERSION LINE\r\njunk".getBytes(ISO_8859_1)
    val rs = Warc.parseWarc(bytes)
    assert(rs.size == 1 && new String(rs.head.payload) == "hello")
  }

  test("salvage: missing Content-Length ends parse (framing lost)") {
    val good = rec("response", "http://x/a", "text/plain", "one".getBytes)
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" +
      "body of unknown length").getBytes(ISO_8859_1)
    val after = rec("response", "http://x/c", "text/plain", "never".getBytes)
    val rs = Warc.parseWarc(good ++ bad ++ after)
    assert(rs.size == 1 && new String(rs.head.payload) == "one")
  }

  test("salvage: EOF inside a payload drops the partial record") {
    val good = rec("response", "http://x/a", "text/plain", "one".getBytes)
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 1000\r\n\r\nonly a little").getBytes(ISO_8859_1)
    val rs = Warc.parseWarc(good ++ truncated)
    assert(rs.size == 1 && new String(rs.head.payload) == "one")
  }

  test("salvage: corrupt gzip member yields the records before it") {
    val m1 = gzipBytes(rec("response", "http://x/a", "text/plain", "one".getBytes))
    val m2 = gzipBytes(rec("response", "http://x/b", "text/plain", "two".getBytes))
    // corrupt the second member's deflate stream body (keep its header)
    val corrupt = m2.clone()
    var i = 12; while (i < corrupt.length - 8) { corrupt(i) = (corrupt(i) ^ 0x55).toByte; i += 1 }
    val rs = Warc.parseWarc(m1 ++ corrupt)
    assert(rs.size == 1 && new String(rs.head.payload) == "one")
  }

  test("oversized record is skipped whole and parsing continues") {
    val big = new Array[Byte](Warc.MaxRecordBytes + 1)
    val bytes = rec("response", "http://x/big", "text/plain", big) ++
      rec("response", "http://x/after", "text/plain", "kept".getBytes)
    val rs = Warc.parseWarc(bytes)
    // index 0 is consumed by the skipped record; the survivor is index 1
    assert(rs.size == 1 && rs.head.record_index == 1)
    assert(new String(rs.head.payload) == "kept")
  }

  test("readWarc explodes records distributed, one row per record per file") {
    val dir = java.nio.file.Files.createTempDirectory("warc-spec")
    Seq("tiny.warc", "tiny.warc.gz").foreach { n =>
      java.nio.file.Files.write(dir.resolve(n), resource(n))
    }
    val df = Warc.readWarc(spark, dir.toString)
    assert(df.count() == 40)
    val statuses = df.filter("http_status = 200").count()
    assert(statuses == 34) // 17 OK responses (9 html/text + 5 media + 3 video) × 2 layouts
    assert(df.select("file").distinct().count() == 2)
  }

  test("chunked / gzip / chunked+gzip entity bodies decode to the page") {
    val rs = Warc.parseWarc(resource("tiny.warc"))
    // records 7/8/9 carry the SAME pages as 3/2/6 behind body codings
    assert(java.util.Arrays.equals(rs(7).payload, rs(3).payload),
      "chunked body != plain page-b")
    assert(java.util.Arrays.equals(rs(8).payload, rs(2).payload),
      "gzipped body != plain page-a")
    assert(java.util.Arrays.equals(rs(9).payload, rs(6).payload),
      "chunked+gzipped body != plain page-c")
    // the decoded payloads are SMALLER than the blocks that carried them
    assert(rs(9).payload.length < rs(9).content_length)
  }

  test("media records: binary payloads decode as real PNG/WAV through the body codings") {
    val rs = Warc.parseWarc(resource("tiny.warc"))
    import graft.functions.MultimodalFunctions.{AudioCodec, ImageCodec}
    // 12/13: perceptual near-dup PNGs, byte-distinct but both decodable
    assert(rs(12).http_content_type == "image/png")
    assert(!java.util.Arrays.equals(rs(12).payload, rs(13).payload))
    assert(ImageCodec.lumaGrid(rs(12).payload).isDefined)
    assert(ImageCodec.lumaGrid(rs(13).payload).isDefined)
    // 14: gzip Content-Encoding around a binary body decodes to a real PNG
    assert(ImageCodec.lumaGrid(rs(14).payload).isDefined)
    // 15/16: WAVs carry decodable 16-bit PCM for the fingerprint kernel
    assert(AudioCodec.bandEnergies(rs(15).payload).isDefined)
    assert(AudioCodec.bandEnergies(rs(16).payload).isDefined)
    // 17/18: the re-hosted clip is byte-identical; 19 is a distinct mp4
    assert(rs(17).http_content_type == "video/mp4")
    assert(java.util.Arrays.equals(rs(17).payload, rs(18).payload))
    assert(!java.util.Arrays.equals(rs(17).payload, rs(19).payload))
    assert(graft.functions.Mp4Demux.demux(rs(17).payload)
      .exists(_.tracks.exists(_.handler == "vide")))
  }

  test("malformed chunk framing salvages the RAW body, never throws") {
    assert(Warc.dechunk("zz\r\nnot hex".getBytes(ISO_8859_1)).isEmpty)
    assert(Warc.dechunk("ff\r\nshort".getBytes(ISO_8859_1)).isEmpty)
    val resp = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "zz\r\nnot a chunk").getBytes(ISO_8859_1)
    val rec = Warc.parseWarc(
      rec0("response", "http://x/bad-chunk", "application/http; msgtype=response", resp))
    assert(rec.size == 1 &&
      new String(rec.head.payload, ISO_8859_1) == "zz\r\nnot a chunk")
  }

  test("overflow-crafted chunk sizes salvage, never index out of bounds") {
    // after one written byte, 7fffffff makes p+n and out.size()+n wrap
    // negative — the naive additive bounds check passes and write() throws
    assert(Warc.dechunk("1\r\nA\r\n7fffffff\r\nX".getBytes(ISO_8859_1)).isEmpty)
    // same crafted size as the FIRST chunk (p > 0 already from the size line)
    assert(Warc.dechunk("7fffffff\r\nX".getBytes(ISO_8859_1)).isEmpty)
    // and through the full record path: raw body salvaged, no task failure
    val resp = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "1\r\nA\r\n7fffffff\r\nX").getBytes(ISO_8859_1)
    val rec = Warc.parseWarc(
      rec0("response", "http://x/of-chunk", "application/http; msgtype=response", resp))
    assert(rec.size == 1 &&
      new String(rec.head.payload, ISO_8859_1) == "1\r\nA\r\n7fffffff\r\nX")
  }

  test("a gzip bomb is truncated to None (raw body kept), never inflated") {
    val bomb = gzipBytes(new Array[Byte](Warc.MaxRecordBytes + 1024))
    assert(Warc.gunzipBounded(bomb).isEmpty)
    // a small gzip decodes fine
    val ok = gzipBytes("hello corpus".getBytes)
    assert(Warc.gunzipBounded(ok).map(new String(_)).contains("hello corpus"))
  }

  private def rec0(rtype: String, uri: String, ctype: String,
      block: Array[Byte]): Array[Byte] = rec(rtype, uri, ctype, block)

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }
}
