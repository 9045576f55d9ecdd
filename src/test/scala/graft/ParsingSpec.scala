package graft

import org.apache.spark.sql.functions._

import graft.functions.Parsing._

/** Table-driven specs mirroring the reference's parser unit tests
  * (tests/unit/test_scraper_utils.py and friends — SURVEY.md §5). */
class ParsingSpec extends SparkSpec {

  test("F11 parseScore: dash, colon, invalid") {
    val r = evalExpr(
      parseScore(lit("2-1")), parseScore(lit("2:1")),
      parseScore(lit("abc")), parseScore(lit("-")))
    assert(r.getStruct(0).getInt(0) == 2 && r.getStruct(0).getInt(1) == 1)
    assert(r.getStruct(1).getInt(0) == 2 && r.getStruct(1).getInt(1) == 1)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("F12 classifyStatus: live / finished / scheduled") {
    val r = evalExpr(
      classifyStatus(lit("45'")), classifyStatus(lit("HT")),
      classifyStatus(lit("FT")), classifyStatus(lit("AET")),
      classifyStatus(lit("19:30")), classifyStatus(lit("PEN")))
    assert(r.getString(0) == "live" && r.getString(1) == "live")
    assert(r.getString(2) == "finished" && r.getString(3) == "finished")
    assert(r.getString(4) == "scheduled" && r.getString(5) == "live")
  }

  test("F7 parseMarketValue: euro-m, k, German Mio/Tsd, dash") {
    val r = evalExpr(
      parseMarketValue(lit("€50.00m")), parseMarketValue(lit("€500k")),
      parseMarketValue(lit("2,5 Mio. €")), parseMarketValue(lit("800 Tsd. €")),
      parseMarketValue(lit("-")))
    assert(r.getDouble(0) == 5.0e7)
    assert(r.getDouble(1) == 5.0e5)
    assert(r.getDouble(2) == 2.5e6)
    assert(r.getDouble(3) == 8.0e5)
    assert(r.isNullAt(4))
  }

  test("F5 toNumber: stoppage time, percent, dash, comma decimal") {
    val r = evalExpr(
      toNumber(lit("90+2")), toNumber(lit("55%")),
      toNumber(lit("—")), toNumber(lit("1,5")), toNumber(lit("42")))
    assert(r.getDouble(0) == 92.0)
    assert(r.getDouble(1) == 55.0)
    assert(r.isNullAt(2))
    assert(r.getDouble(3) == 1.5)
    assert(r.getDouble(4) == 42.0)
  }

  test("F6 parseMinute: 45'+2 -> 47") {
    val r = evalExpr(parseMinute(lit("45'+2")), parseMinute(lit("90'")), parseMinute(lit("x")))
    assert(r.getLong(0) == 47L && r.getLong(1) == 90L && r.isNullAt(2))
  }

  test("F9 toDecimalOdds: fractional, American +/-, decimal") {
    val r = evalExpr(
      toDecimalOdds(lit("3/2")), toDecimalOdds(lit("+150")),
      toDecimalOdds(lit("-110")), toDecimalOdds(lit("1,91")))
    assert(r.getDouble(0) == 2.5)
    assert(r.getDouble(1) == 2.5)
    assert(math.abs(r.getDouble(2) - 1.9090909) < 1e-6)
    assert(r.getDouble(3) == 1.91)
  }

  test("F10 impliedProb: 1/price, validator floor") {
    val r = evalExpr(impliedProb(lit(2.0)), impliedProb(lit(0.5)))
    assert(r.getDouble(0) == 0.5 && r.isNullAt(1))
  }

  test("F1/F2/F3 cleanText, parseInt, parseDecimal") {
    val r = evalExpr(
      cleanText(lit("  a   b  ")), cleanText(lit("   ")),
      parseInt(lit("1.234 players")), parseInt(lit("abc")),
      parseDecimal(lit("ca. 1,75 m")))
    assert(r.getString(0) == "a b")
    assert(r.isNullAt(1))
    assert(r.getLong(2) == 1234L)
    assert(r.isNullAt(3))
    assert(r.getDouble(4) == 1.75)
  }

  test("F4 parseDateMulti: all five formats") {
    val r = evalExpr(
      parseDateMulti(lit("24.06.1987")), parseDateMulti(lit("1987-06-24")),
      parseDateMulti(lit("24/06/1987")), parseDateMulti(lit("Jun 24 1987")),
      parseDateMulti(lit("24 Jun 1987")), parseDateMulti(lit("garbage")))
    (0 to 4).foreach { i =>
      assert(r.getDate(i).toString == "1987-06-24", s"format $i")
    }
    assert(r.isNullAt(5))
  }

  test("F13 classifyResult / F15 fullName / F16 ageYears") {
    val r = evalExpr(
      classifyResult(lit(2), lit(1)), classifyResult(lit(0), lit(0)),
      classifyResult(lit(0), lit(3)),
      fullName(lit("Lionel"), lit("Messi")),
      ageYears(lit("1987-06-24").cast("date"), lit("2025-06-23").cast("date")),
      ageYears(lit("1987-06-24").cast("date"), lit("2025-06-24").cast("date")))
    assert(r.getString(0) == "home_win" && r.getString(1) == "draw" && r.getString(2) == "away_win")
    assert(r.getString(3) == "Lionel Messi")
    assert(r.getInt(4) == 37 && r.getInt(5) == 38)
  }

  test("F20 slugify: umlauts, eszett, punctuation") {
    val r = evalExpr(slugify(lit("1. FC Köln")), slugify(lit("TSG Hoffenheim ß")))
    assert(r.getString(0) == "1-fc-koeln")
    assert(r.getString(1) == "tsg-hoffenheim-ss")
  }

  test("F21 tmIdFromHref") {
    val r = evalExpr(
      tmIdFromHref(lit("/lionel-messi/profil/spieler/28003")),
      tmIdFromHref(lit("/fc-barcelona/startseite/verein/131")))
    assert(r.getString(0) == "28003" && r.getString(1) == "131")
  }

  test("F8 parseTransferFee typing") {
    val r = evalExpr(
      parseTransferFee(lit("free transfer")), parseTransferFee(lit("Loan")),
      parseTransferFee(lit("€12.00m")), parseTransferFee(lit("?")))
    assert(r.getStruct(0).getString(0) == "free")
    assert(r.getStruct(1).getString(0) == "loan")
    assert(r.getStruct(2).getString(0) == "transfer_fee")
    assert(r.getStruct(2).getDouble(1) == 1.2e7)
    assert(r.getStruct(3).getString(0) == "unknown")
  }

  test("F29 externalId is deterministic sha2; surrogateId is xxhash64") {
    val r = evalExpr(
      externalId(lit("home"), lit("away"), lit("2024-01-01")),
      externalId(lit("home"), lit("away"), lit("2024-01-01")),
      surrogateId(lit("nation"), lit("GERMANY")))
    assert(r.getString(0) == r.getString(1) && r.getString(0).length == 64)
    assert(!r.isNullAt(2))
  }

  test("Urls: host/domain/path/query extraction and canonicalization") {
    import graft.functions.Urls
    val u = lit("HTTP://WWW.Example.COM/a/b?utm_source=x&id=7&gclid=z&ref=keep#frag")
    val r = evalExpr(Urls.host(u), Urls.domain(u), Urls.path(u),
      Urls.cleanQuery(u), Urls.canonicalize(u))
    assert(r.getString(0) == "WWW.Example.COM")
    assert(r.getString(1) == "example.com")
    assert(r.getString(2) == "/a/b")
    assert(r.getString(3) == "id=7&ref=keep")
    assert(r.getString(4) == "https://example.com/a/b?id=7&ref=keep")
    // no path, all-tracking query -> trailing slash, no '?'
    val bare = evalExpr(
      Urls.canonicalize(lit("https://site.org?utm_campaign=a&fbclid=b")),
      Urls.canonicalize(lit("not a url")),
      Urls.domain(lit("https://site.org/x")))
    assert(bare.getString(0) == "https://site.org/")
    // non-URL input canonicalizes to NULL (no throw) — the old shared
    // "https:///" prefix lumped every hostless input into one dedup
    // bucket, silently dropping distinct pages as duplicates
    assert(bare.isNullAt(1))
    assert(bare.getString(2) == "site.org")
    // tracking variants of one page share a canonical key (the dedup point)
    val pair = evalExpr(
      Urls.canonicalize(lit("https://www.a.com/p?id=1&utm_source=tw")),
      Urls.canonicalize(lit("https://a.com/p?id=1")))
    assert(pair.getString(0) == pair.getString(1))
    // a '?' inside the fragment is NOT a query — must not leak into the key
    val frag = evalExpr(
      Urls.query(lit("https://a.com/p#section?x=1")),
      Urls.canonicalize(lit("https://a.com/p#section?x=1")),
      Urls.canonicalize(lit("https://a.com/p")))
    assert(frag.getString(0) == "")
    assert(frag.getString(1) == frag.getString(2))
  }
}
