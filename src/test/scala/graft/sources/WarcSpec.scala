package graft.sources

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.sources.Warc.WarcPage

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val pages = Seq(
    WarcPage("https://a.example.org/1", "2024-01-02T03:00:00Z", 200,
      "text/html", "<html><body>hello <b>world</b></body></html>"),
    WarcPage("https://b.example.com/x?q=1", "2024-02-03T04:05:06Z", 404,
      "text/plain", "not here"),
    WarcPage("https://c.example.net/", "2024-03-04T05:06:07Z", 200,
      "text/html", "umlauts äöü and 中文 survive"))

  test("write -> parse roundtrip: all response pages, in order, byte-exact fields") {
    val parsed = Warc.parseWarcPages(Warc.writeWarcBytes(pages))
    assert(parsed == pages)
  }

  test("non-response records (warcinfo, request) never surface as pages") {
    val bytes = Warc.writeWarcBytes(pages)
    // the blob holds 1 warcinfo + 3 requests + 3 responses = 7 records;
    // exactly the 3 responses come back
    assert(Warc.parseWarcPages(bytes).length == 3)
  }

  test("multi-byte bodies frame by BYTE length, not char length") {
    val p = pages(2)
    val round = Warc.parseWarcPages(Warc.writeWarcBytes(Seq(p)))
    assert(round == Seq(p))
    assert(p.html.getBytes(StandardCharsets.UTF_8).length > p.html.length)
  }

  test("truncated payload refuses the tail but keeps prior records") {
    val bytes = Warc.writeWarcBytes(pages)
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 10)
    val parsed = Warc.parseWarcPages(cut)
    // the last response record is truncated: everything before it parses
    assert(parsed == pages.take(2))
  }

  test("garbage and malformed version lines refuse without throwing") {
    assert(Warc.parseWarcPages(null) == Nil)
    assert(Warc.parseWarcPages(Array[Byte]()) == Nil)
    assert(Warc.parseWarcPages("not a warc at all".getBytes) == Nil)
    val bad = Warc.writeWarcBytes(pages.take(1))
    bad(0) = 'X' // corrupt the WARC/1.1 magic
    assert(Warc.parseWarcPages(bad) == Nil)
    // non-numeric Content-Length: flip a digit to a letter
    val s = new String(Warc.writeWarcBytes(pages.take(1)), StandardCharsets.ISO_8859_1)
    val hacked = s.replaceFirst("Content-Length: [0-9]", "Content-Length: x")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(Warc.parseWarcPages(hacked) == Nil)
  }

  test("header names parse case-insensitively") {
    val blob = new String(Warc.writeWarcBytes(pages.take(1)), StandardCharsets.ISO_8859_1)
      .replace("WARC-Type: response", "warc-TYPE: response")
      .replace("WARC-Target-URI", "warc-target-uri")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(Warc.parseWarcPages(blob) == pages.take(1))
  }

  test("a response without an HTTP payload is skipped, not fatal") {
    val good = pages.take(1)
    val raw = Warc.writeWarcBytes(good)
    // append a response record whose payload is NOT an HTTP message
    val payload = "just bytes".getBytes(StandardCharsets.UTF_8)
    val head = ("WARC/1.1\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://broken.example/\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val blob = raw ++ head ++ payload ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    assert(Warc.parseWarcPages(blob) == good)
  }

  test("gzip WARC: per-record members (CommonCrawl layout) parse identically") {
    val gz = Warc.writeWarcGzBytes(pages)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    // per-record members concatenated: the multi-member stream inflates
    // whole and frames exactly like the plain file
    assert(Warc.parseWarcPages(gz) == pages)
    // single-member gzip of the whole plain file also parses
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(Warc.writeWarcBytes(pages)); out.finish(); out.close()
    assert(Warc.parseWarcPages(bos.toByteArray) == pages)
    // corrupt gzip refuses without throwing
    val bad = gz.clone(); bad(gz.length / 2) = (bad(gz.length / 2) ^ 0x55).toByte
    val parsed = Warc.parseWarcPages(bad) // prefix may survive; must not throw
    assert(parsed.length <= pages.length)
    val cut = java.util.Arrays.copyOfRange(gz, 0, gz.length / 2)
    assert(Warc.parseWarcPages(cut).length <= pages.length)
  }

  test("gunzipAll refuses an inflation bomb at the cap") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(new Array[Byte](4 * 1024 * 1024)); out.finish(); out.close()
    assert(Warc.gunzipAll(bos.toByteArray, maxBytes = 1024 * 1024).isEmpty)
    assert(Warc.gunzipAll(bos.toByteArray).exists(_.length == 4 * 1024 * 1024))
  }

  test("property: parseWarcPages never throws - arbitrary bytes and mutated real archives") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val junk = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
    val real = Warc.writeWarcBytes(pages)
    val realGz = Warc.writeWarcGzBytes(pages)
    // three hostile families: pure noise, a real archive with one byte
    // flipped anywhere, and a gzip archive cut anywhere
    val mutated = for {
      base <- Gen.oneOf(real, realGz)
      i <- Gen.chooseNum(0, base.length - 1)
      b <- Gen.chooseNum(-128, 127).map(_.toByte)
    } yield { val c = base.clone(); c(i) = b; c }
    val truncated = Gen.chooseNum(0, realGz.length - 1)
      .map(n => java.util.Arrays.copyOfRange(realGz, 0, n))
    val anyBytes = Gen.oneOf(junk.map(_.toArray), mutated, truncated)
    val prop = Prop.forAll(anyBytes) { bytes =>
      Warc.parseWarcPages(bytes) // must return, never throw
      true
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200).withInitialSeed(Seed(11L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("ingest explodes blob rows into page rows beside the id") {
    val df = Seq(
      (10L, Warc.writeWarcBytes(pages.take(2))),
      (20L, Warc.writeWarcBytes(pages.drop(2)))
    ).toDF("blob_id", "blob")
    val out = Warc.ingest(df, "blob_id", "blob")
      .orderBy("blob_id", "url")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3),
        r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      (10L, pages(0).url, pages(0).fetchTime, 200, "text/html", pages(0).html),
      (10L, pages(1).url, pages(1).fetchTime, 404, "text/plain", pages(1).html),
      (20L, pages(2).url, pages(2).fetchTime, 200, "text/html", pages(2).html)))
  }

  test("readWarcFiles: one .warc file per task, directory scan roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("warcsrc")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("a.warc"), Warc.writeWarcBytes(pages.take(2)))
    java.nio.file.Files.write(dir.resolve("b.warc"), Warc.writeWarcBytes(pages.drop(2)))
    java.nio.file.Files.write(dir.resolve("ignore.txt"), "noise".getBytes)
    val out = Warc.readWarcFiles(spark, dir.toString)
    assert(out.count() == 3)
    assert(out.select("url").as[String].collect().sorted.toSeq ==
      pages.map(_.url).sorted)
    // the glob keeps the non-warc file out of the scan entirely
    assert(!out.select("path").as[String].collect().exists(_.endsWith("ignore.txt")))
  }
}
