package graft

import org.apache.spark.sql.functions._

import graft.functions.JsonNorm
import graft.sources.Bronze

/** Mirrors the reference's JSON-normalization unit tests
  * (tests/unit/test_utils.py:6-55) and HTML-fixture parser tests
  * (tests/conftest.py:31-120 pattern). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def norm(json: String) =
    spark.range(1).select(JsonNorm.normalizeGameJson(lit(json)).as("g"))
      .select("g.*").head()

  test("normalizeGameNode: home/away objects + score string") {
    val r = norm("""{"id":"m1","home":{"name":"A","id":"a1"},
      "away":{"name":"B","id":"b1"},"score":"2-1"}""")
    assert(r.getAs[String]("home") == "A" && r.getAs[String]("away") == "B")
    assert(r.getAs[String]("home_id") == "a1")
    assert(r.getAs[Int]("home_score") == 2 && r.getAs[Int]("away_score") == 1)
  }

  test("normalizeGameNode: homeTeam/awayTeam + homeScore/awayScore") {
    val r = norm("""{"homeTeam":{"name":"A"},"awayTeam":{"name":"B"},
      "homeScore":3,"awayScore":0}""")
    assert(r.getAs[String]("home") == "A")
    assert(r.getAs[Int]("home_score") == 3 && r.getAs[Int]("away_score") == 0)
  }

  test("normalizeGameNode: teams.home/away + scores.ft") {
    val r = norm("""{"teams":{"home":{"name":"A"},"away":{"name":"B"}},
      "scores":{"ft":{"home":1,"away":1}}}""")
    assert(r.getAs[String]("home") == "A")
    assert(r.getAs[Int]("home_score") == 1 && r.getAs[Int]("away_score") == 1)
  }

  test("normalizeGameNode: participants list by side") {
    val r = norm("""{"participants":[{"side":"home","name":"A","id":"x"},
      {"side":"away","name":"B","id":"y"}]}""")
    assert(r.getAs[String]("home") == "A" && r.getAs[String]("away") == "B")
    assert(r.getAs[String]("home_id") == "x" && r.getAs[String]("away_id") == "y")
  }

  test("extractTableRows: header+data rows, nested tags stripped") {
    val html = """<html><body><table class="squad">
      |<tr><th>Name</th><th>Value</th></tr>
      |<tr><td><a href="/p/1">Foo</a></td><td>42</td></tr>
      |<tr><td>Bar</td><td>€50.00m</td></tr>
      |</table></body></html>""".stripMargin
    val rows = spark.range(1).select(Bronze.extractTableRows(lit(html)).as("r"))
      .head().getSeq[scala.collection.Seq[String]](0).map(_.toList)
    assert(rows.length == 3)
    assert(rows(0) == List("Name", "Value"))
    assert(rows(1) == List("Foo", "42"))
    assert(rows(2) == List("Bar", "€50.00m"))
  }

  test("SiteParsers.squadFromPages: typed squad records from raw HTML (S8)") {
    import graft.sources.SiteParsers
    val html = """<table class="items">
      |<tr><th>#</th><th>Player</th><th>Pos</th><th>Born</th><th>Nat</th><th>Value</th></tr>
      |<tr><td>10</td><td><a>Lionel Messi</a></td><td>RW</td><td>24.06.1987</td><td>Argentina</td><td>€50.00m</td></tr>
      |<tr><td>1</td><td>Keeper  Guy</td><td>GK</td><td>01.01.1990</td><td>Germany</td><td>800 Tsd. €</td></tr>
      |</table>""".stripMargin
    val pages = Seq(html).toDF("html").withColumn("snapshot_path", lit("p1"))
    val out = SiteParsers.squadFromPages(pages).orderBy("number").collect()
    assert(out.length == 2)
    val messi = out.find(_.getAs[Int]("number") == 10).get
    assert(messi.getAs[String]("name") == "Lionel Messi")
    assert(messi.getAs[java.sql.Date]("birth_date").toString == "1987-06-24")
    assert(messi.getAs[Double]("market_value") == 5.0e7)
    assert(out.find(_.getAs[Int]("number") == 1).get.getAs[Double]("market_value") == 8.0e5)
  }

  test("SiteParsers.odds1x2FromPages: odds formats + implied probs (S13)") {
    import graft.sources.SiteParsers
    val html = """<table><tr><th>Bookmaker</th><th>1</th><th>X</th><th>2</th></tr>
      |<tr><td>bet365</td><td>2.50</td><td>3,20</td><td>+150</td></tr>
      |<tr><td>pinnacle</td><td>5/2</td><td>3.10</td><td>-110</td></tr>
      |</table>""".stripMargin
    val pages = Seq(html).toDF("html").withColumn("snapshot_path", lit("p1"))
    val out = SiteParsers.odds1x2FromPages(pages).orderBy("bookmaker").collect()
    assert(out.length == 2)
    val b365 = out.head
    assert(b365.getAs[Double]("odds_home") == 2.5)
    assert(b365.getAs[Double]("odds_draw") == 3.2)
    assert(b365.getAs[Double]("odds_away") == 2.5) // +150 American
    assert(math.abs(b365.getAs[Double]("overround") - (1 / 2.5 + 1 / 3.2 + 1 / 2.5)) < 1e-12)
    assert(out(1).getAs[Double]("odds_home") == 3.5) // 5/2 fractional
  }

  test("extractNextData + normalizeGameJson: hydration JSON to game record (S16)") {
    val html = """<html><body><div>stuff</div>
      |<script id="__NEXT_DATA__" type="application/json">{"homeTeam":{"name":"A"},
      |"awayTeam":{"name":"B"},"homeScore":2,"awayScore":2}</script>
      |</body></html>""".stripMargin
    val r = spark.range(1)
      .select(JsonNorm.normalizeGameJson(Bronze.extractNextData(lit(html))).as("g"))
      .select("g.*").head()
    assert(r.getAs[String]("home") == "A" && r.getAs[String]("away") == "B")
    assert(r.getAs[Int]("home_score") == 2)
    val none = spark.range(1)
      .select(Bronze.extractNextData(lit("<html>no hydration</html>"))).head()
    assert(none.isNullAt(0))
  }

  test("scrapedDataFrame: K7 bronze capture shape with JSON payload") {
    val df = Seq(("A", 1), ("B", 2)).toDF("team", "rank")
    val out = Bronze.scrapedDataFrame(df, "test_scraper")
    assert(out.columns.toSeq == Seq("scraper_name", "data", "created_at"))
    val rows = out.collect()
    assert(rows.forall(_.getString(0) == "test_scraper"))
    assert(rows.map(_.getString(1)).contains("""{"team":"A","rank":1}"""))
  }
}
