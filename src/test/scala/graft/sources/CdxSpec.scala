package graft.sources

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.ops.WebOps

class CdxSpec extends SparkSpec {
  import spark.implicits._

  private def surtOf(url: String): String =
    Seq(url).toDF("u").select(WebOps.surtKey(col("u"))).as[String].head()

  test("surt: host labels reversed, www stripped, fragment cut") {
    assert(surtOf("https://www.example.com/path?x=1#frag")
      == "com,example)/path?x=1")
  }

  test("surt: default ports drop, explicit non-default ports survive") {
    assert(surtOf("https://a.example.com:443/p") == "com,example,a)/p")
    assert(surtOf("http://a.example.com:80/p") == "com,example,a)/p")
    assert(surtOf("http://a.example.com:8080/p") == "com,example,a:8080)/p")
    // 443 is NOT the default for http
    assert(surtOf("http://a.example.com:443/p") == "com,example,a:443)/p")
  }

  test("surt: empty path keys as /, path lowercases, query params sort") {
    assert(surtOf("https://Ex.COM") == "com,ex)/")
    assert(surtOf("https://ex.com/A/B") == "com,ex)/a/b")
    assert(surtOf("https://ex.com/p?b=2&a=1&c=3") == "com,ex)/p?a=1&b=2&c=3")
  }

  test("surt: query params lowercase BEFORE sorting (pywb order)") {
    // with sort-then-lower, 'B=2' < 'a=1' bytewise would emit the
    // UNSORTED key b=2&a=1 - and ?a=1&B=2 / ?a=1&b=2 would split what
    // is one archive entry
    assert(surtOf("https://ex.com/p?a=1&B=2") == "com,ex)/p?a=1&b=2")
    assert(surtOf("https://ex.com/p?B=2&a=1") == "com,ex)/p?a=1&b=2")
    assert(surtOf("https://ex.com/p?b=2&a=1") == "com,ex)/p?a=1&b=2")
  }

  test("surt: userinfo strips with the host parse; only ONE www label strips") {
    assert(surtOf("https://user:pw@ex.com/p") == "com,ex)/p")
    assert(surtOf("https://www.www.ex.com/p") == "com,ex,www)/p")
  }

  test("cdx line build -> parse roundtrip, json spaces intact (limit-3 split)") {
    val df = Seq(
      ("com,ex)/p?a=1", "20240102030405", "https://ex.com/p?a=1",
        "text/html", "200", "sha1:AB CD", "123", "456", "seg/f.warc.gz"),
      ("org,other)/", "20240203040506", "https://other.org/",
        "text/plain", "404", "d2", "7", "0", "seg/g.warc.gz"))
      .toDF("s", "t", "u", "m", "st", "d", "l", "o", "f")
    val lines = df.select(Cdx.cdxLine(col("s"), col("t"), col("u"), col("m"),
      col("st"), col("d"), col("l"), col("o"), col("f")).as("value"))
    val parsed = Cdx.parseCdxLines(lines, "value")
      .orderBy(col("surt_key"))
      .as[(String, String, String, String, String, String, String, String, String)]
      .collect()
    assert(parsed.length == 2)
    val first = parsed.head
    assert(first._1 == "com,ex)/p?a=1" && first._2 == "20240102030405")
    // the digest's embedded space survived the limit-3 split
    assert(first._6 == "sha1:AB CD")
    assert(first._9 == "seg/f.warc.gz")
  }

  test("malformed lines drop, well-formed neighbours survive") {
    val lines = Seq(
      "com,ex)/p 20240101000000 {\"url\":\"https://ex.com/p\"}",
      "only-two fields",
      "",
      "com,ex)/q 20240101000001 not-json",
      "com,ex)/r 20240101000002 {\"url\":\"https://ex.com/r\",\"status\":\"200\"}")
      .toDF("value")
    val parsed = Cdx.parseCdxLines(lines, "value")
      .select(col("surt_key"), col("url"), col("status")).collect()
    assert(parsed.length == 2)
    assert(parsed.map(_.getString(0)).sorted.toSeq == Seq("com,ex)/p", "com,ex)/r"))
  }

  test("parseCdxLines never throws on fuzz noise (refuse-don't-crash)") {
    val rnd = new scala.util.Random(1234)
    val noise = (1 to 200).map { i =>
      val len = rnd.nextInt(80)
      new String((0 until len).map(_ => (rnd.nextInt(95) + 32).toChar).toArray)
    } ++ Seq(
      "surt 20240101000000 {\"url\":null}", // null url -> drops
      "surt 20240101000000 [1,2,3]",        // json, wrong shape -> drops
      "a b {\"url\":\"u\",\"extra\":\"ignored\"}") // extra fields fine
    val out = Cdx.parseCdxLines(noise.toDF("value"), "value").collect()
    // whatever survives framed as a real record; nothing threw
    assert(out.forall(r => r.getString(2) != null))
  }

  test("write -> read gzip shards roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_spec").toString
    val df = Seq(
      ("com,a)/", "20240101000000", "https://a.com/", "text/html", "200",
        "d1", "10", "0", "f1.warc.gz"),
      ("com,b)/x", "20240101000001", "https://b.com/x", "text/html", "301",
        "d2", "20", "99", "f2.warc.gz"))
      .toDF("s", "t", "u", "m", "st", "d", "l", "o", "f")
      .select(Cdx.cdxLine(col("s"), col("t"), col("u"), col("m"), col("st"),
        col("d"), col("l"), col("o"), col("f")).as("line"))
    Cdx.writeCdx(df, "line", dir)
    // at-rest layout really is gzip
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".gz")))
    val back = Cdx.readCdx(spark, dir).orderBy(col("surt_key"))
      .select(col("surt_key"), col("cdx_ts"), col("url"), col("status"))
      .as[(String, String, String, String)].collect()
    assert(back.toSeq == Seq(
      ("com,a)/", "20240101000000", "https://a.com/", "200"),
      ("com,b)/x", "20240101000001", "https://b.com/x", "301")))
  }

  test("timestamp14 zero-pads every part") {
    val ts = Seq((2024L, 3L, 4L, 5L, 6L, 7L)).toDF("y", "mo", "d", "h", "mi", "s")
      .select(Cdx.timestamp14(col("y"), col("mo"), col("d"), col("h"),
        col("mi"), col("s"))).as[String].head()
    assert(ts == "20240304050607")
  }

  test("fetchList: unchanged (surt, digest) pairs drop, changed/new survive") {
    val cand = Seq(("s1", "d1", 1L), ("s2", "d2", 2L), ("s3", "d3", 3L))
      .toDF("surt", "digest", "id")
    val index = Seq(("s1", "d1"), ("s2", "dX")).toDF("surt", "digest")
    val out = WebOps.fetchList(cand, "surt", "digest", index, "surt", "digest")
      .select(col("id")).as[Long].collect().sorted.toSeq
    // s1 unchanged -> drops; s2 digest changed -> fetch; s3 new -> fetch
    assert(out == Seq(2L, 3L))
  }

  test("recrawlSchedule: halve on change, double on stable, min-digest fold") {
    val prev = Seq(("s1", "a"), ("s1", "b"), ("s2", "c")).toDF("surt", "digest")
    val cur = Seq(("s1", "a"), ("s2", "zz"), ("s3", "new")).toDF("surt", "digest")
    val out = WebOps.recrawlSchedule(prev, "surt", "digest",
        cur, "surt", "digest", baseDays = 7, minDays = 1, maxDays = 30)
      .select(col("surt"), col("changed"), col("interval_days"))
      .as[(String, Boolean, Int)].collect().sortBy(_._1).toSeq
    // s1: min(a,b)=a vs a -> stable -> 14; s2: c vs zz -> changed -> 3;
    // s3 only in cur -> no schedule (inner join)
    assert(out == Seq(("s1", false, 14), ("s2", true, 3)))
  }

  test("latestCaptures: max-ts wins per surt; same-second ties break by struct order") {
    val cols = Seq("surt_key", "cdx_ts", "url", "mime", "status",
      "digest", "length", "offset", "filename")
    val caps = Seq(
      ("s1", "20240101000000", "u1", "text/html", "200", "dA", "1", "0", "f"),
      ("s1", "20250101000000", "u1", "text/html", "200", "dB", "1", "0", "f"),
      // same-second recapture: the struct compare falls through to url
      ("s2", "20240101000000", "uA", "text/html", "200", "d", "1", "0", "f"),
      ("s2", "20240101000000", "uB", "text/html", "200", "d", "1", "0", "f"))
      .toDF(cols: _*)
    val out = Cdx.latestCaptures(caps)
      .select(col("surt_key"), col("cdx_ts"), col("url"), col("digest"))
      .as[(String, String, String, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("s1", "20250101000000", "u1", "dB"),
      ("s2", "20240101000000", "uB", "d")))
  }

  test("robotsMetaDirectives: both attribute orders, token matches, none = both") {
    val rows = Seq(
      (1L, "<head><meta name=\"robots\" content=\"noindex, nofollow\"></head>"),
      (2L, "<head><meta content=\"NOFOLLOW\" name=\"robots\"></head>"),
      (3L, "<head><meta name='robots' content='none'></head>"),
      (4L, "<head><meta name=\"robots\" content=\"index, follow\"></head>"),
      // noindexING must NOT match the noindex token
      (5L, "<head><meta name=\"robots\" content=\"noindexing\"></head>"),
      (6L, "<head>no robots tag at all</head>")).toDF("id", "html")
    val out = WebOps.robotsMetaDirectives(rows, "html")
      .select(col("id"), col("noindex"), col("nofollow"))
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, true, true), (2L, false, true), (3L, true, true),
      (4L, false, false), (5L, false, false), (6L, false, false)))
  }

  test("robotsMetaDirectives: noarchive/nosnippet tokens; none does NOT imply them") {
    val rows = Seq(
      (1L, "<head><meta name=\"robots\" content=\"noarchive, nosnippet\"></head>"),
      (2L, "<head><meta name='robots' content='none'></head>"),
      (3L, "<head><meta name=\"robots\" content=\"noarchiveX, Xnosnippet\"></head>"),
      (4L, "<head><meta name=\"robots\" content=\"NOARCHIVE\"></head>"))
      .toDF("id", "html")
    val out = WebOps.robotsMetaDirectives(rows, "html")
      .select(col("id"), col("noindex"), col("noarchive"), col("nosnippet"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, false, true, true),
      // none = noindex+nofollow ONLY (the protocol's shorthand)
      (2L, true, false, false),
      (3L, false, false, false), // token boundaries hold
      (4L, false, true, false))) // content case-folds
  }

  test("hreflangAlternates: both attribute orders, x-default, rel gate, raw hrefs") {
    val rows = Seq(
      (1L, "<head><link rel=\"alternate\" hreflang=\"EN\" href=\"https://en.ex/p\">" +
        "<link hreflang='de-AT' rel='alternate' href='/de/p'>" +
        "<link rel=\"alternate\" hreflang=\"x-default\" href=\"https://ex/p\"></head>"),
      // no rel=alternate: a stylesheet with an hreflang attribute drops
      (2L, "<link rel=\"stylesheet\" hreflang=\"fr\" href=\"/m.css\">"),
      // missing href drops; missing hreflang never matched the element scan
      (3L, "<link rel=\"alternate\" hreflang=\"it\">"),
      (4L, "no links here")).toDF("id", "html")
    val got = WebOps.hreflangAlternates(rows, "html")
      .select(col("id"), col("hreflang"), col("alt_href"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "en", "https://en.ex/p"),
      (1L, "de-at", "/de/p"), // raw relative href - resolution is resolveLinks' job
      (1L, "x-default", "https://ex/p")), got.toString)
  }

  test("crawlTraps: repeat_share flags recursion, avg_depth flags mazes, minUrls gates") {
    val urls =
      (1 to 6).map(i => s"https://trap.org/cal/2024/cal/2024/cal/$i") ++
        (1 to 6).map(i => s"https://deep.org/a/b/c/d/e/f/g/$i") ++
        (1 to 6).map(i => s"https://fine.org/p/$i") ++
        // flaggable signals but below minUrls -> never flagged
        (1 to 2).map(i => s"https://tiny.org/x/$i/x/$i/x")
    val out = WebOps.crawlTraps(urls.toDF("url"), "url",
        minUrls = 5, maxAvgDepth = 6.5, maxRepeatShare = 0.3)
      .select(col("domain"), col("flagged"), col("repeat_share"))
      .as[(String, Boolean, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(r => (r._1, r._2)) == Seq(
      ("deep.org", true), ("fine.org", false),
      ("tiny.org", false), ("trap.org", true)))
    assert(out.find(_._1 == "trap.org").get._3 == 1.0)
  }

  test("staleCaptures: newer lastmod or never-captured survive, fresh captures drop") {
    val pages = Seq(
      ("https://a.com/p", "20240110000000", 1L), // captured 01-05, modified 01-10 -> stale
      ("https://a.com/q", "20240101000000", 2L), // captured 01-05, modified 01-01 -> fresh
      ("https://b.com/r", "20240101000000", 3L)) // never captured
      .toDF("url", "lm14", "id")
    val index = Seq(("com,a)/p", "20240105000000"), ("com,a)/q", "20240105000000"))
      .toDF("surt_key", "cdx_ts")
    val out = WebOps.staleCaptures(pages, "url", "lm14", index)
      .select(col("id"), col("never_captured"))
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, false), (3L, true)))
  }

  test("recrawlSchedule clamps to [minDays, maxDays]") {
    val prev = Seq(("s1", "a"), ("s2", "c")).toDF("surt", "digest")
    val cur = Seq(("s1", "a"), ("s2", "z")).toDF("surt", "digest")
    val out = WebOps.recrawlSchedule(prev, "surt", "digest",
        cur, "surt", "digest", baseDays = 8, minDays = 6, maxDays = 10)
      .select(col("surt"), col("interval_days"))
      .as[(String, Int)].collect().sortBy(_._1).toSeq
    // stable doubles 16 -> clamp 10; changed halves 4 -> clamp 6
    assert(out == Seq(("s1", 10), ("s2", 6)))
  }
}
