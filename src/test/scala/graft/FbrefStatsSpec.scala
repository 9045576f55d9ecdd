package graft

import org.apache.spark.sql.functions._

import graft.sources.FbrefStats

/** S5 parser semantics, mirroring the reference's fbref parsing behavior
  * (fbref_match_scraper.py:172-195 `_to_number`, :197-283
  * `parse_player_tables`, :286-345 `parse_team_stats`). */
class FbrefStatsSpec extends SparkSpec {
  import spark.implicits._

  test("toNumber mirrors _to_number: dashes, stoppage time, percents, comma decimals") {
    val r = evalExpr(
      FbrefStats.toNumber(lit("")), FbrefStats.toNumber(lit("—")),
      FbrefStats.toNumber(lit("-")), FbrefStats.toNumber(lit("90+2")),
      FbrefStats.toNumber(lit("45+2+1")), FbrefStats.toNumber(lit("55%")),
      FbrefStats.toNumber(lit("55,5%")), FbrefStats.toNumber(lit("1,5")),
      FbrefStats.toNumber(lit(" 12 ")), FbrefStats.toNumber(lit("-3")),
      FbrefStats.toNumber(lit("0.31")), FbrefStats.toNumber(lit("GK")))
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 92.0 && r.getDouble(4) == 48.0)
    assert(r.getDouble(5) == 55.0 && r.getDouble(6) == 55.5)
    assert(r.getDouble(7) == 1.5 && r.getDouble(8) == 12.0)
    assert(r.getDouble(9) == -3.0 && r.getDouble(10) == 0.31)
    assert(r.isNullAt(11))
  }

  private val playerPage =
    """<html><body>
      |<table id="lineups"><tbody><tr>
      |  <th data-stat="player" data-append-csv="NOT_A_STATS_TABLE">x</th>
      |  <td data-stat="minutes">999</td></tr></tbody></table>
      |<table id="stats_player_summary"><thead>
      |  <tr><th data-stat="player">Player</th><th data-stat="minutes">Min</th></tr>
      |</thead><tbody>
      |  <tr class="thead"><td data-stat="junk">spacer</td></tr>
      |  <tr><th data-stat="player" data-append-csv="aa111">Alpha</th>
      |      <td data-stat="minutes">90+3</td>
      |      <td data-stat="shots">4</td>
      |      <td data-stat="position">FW</td></tr>
      |  <tr><th data-stat="player" data-append-csv="bb222">Beta</th>
      |      <td data-stat="minutes">67</td>
      |      <td data-stat="shots">—</td></tr>
      |</tbody></table>
      |<!-- <table id="stats_misc"><tbody>
      |  <tr><th data-append-csv="aa111" data-stat="player">Alpha</th>
      |      <td data-stat="shots"><strong>5</strong></td>
      |      <td data-stat="fouls">2</td></tr>
      |</tbody></table> -->
      |<table id="stats_keeper_summary"><tbody>
      |  <tr><th data-stat="player" data-append-csv="gk333">Keeper</th>
      |      <td data-stat="gk_saves">6</td>
      |      <td data-stat="minutes">90</td></tr>
      |</tbody></table>
      |</body></html>""".stripMargin

  test("playerStats: stats_ tables only, comment-embedded seen, last table wins, separators skipped") {
    val pages = Seq(("m1", playerPage)).toDF("page_id", "html")
    val out = FbrefStats.playerStats(pages, "html", Seq("page_id"))
      .orderBy("fbref_player_id").collect()
    assert(out.map(_.getAs[String]("fbref_player_id")).toSeq == Seq("aa111", "bb222", "gk333"))
    val alpha = out(0).getAs[Map[String, String]]("stats")
    assert(alpha("shots") == "5")          // commented stats_misc overrides
    assert(alpha("minutes") == "90+3")     // raw string preserved in the map
    assert(alpha("fouls") == "2" && alpha("position") == "FW")
    val beta = out(1).getAs[Map[String, String]]("stats")
    assert(beta("shots") == "—")
    val gk = out(2).getAs[Map[String, String]]("stats")
    assert(gk("gk_saves") == "6")          // stats_keeper_* rides the same path
  }

  test("playerMatchStats: CORE_MAP typing + metrics_extra JSON remainder") {
    val pages = Seq(("m1", playerPage)).toDF("page_id", "html")
    val out = FbrefStats.playerMatchStats(pages, "html", Seq("page_id"))
      .orderBy("fbref_player_id").collect()
    val alpha = out(0)
    assert(alpha.getAs[Long]("minutes") == 93L)      // "90+3" coerced then int-cast
    assert(alpha.getAs[Long]("shots_total") == 5L)   // last-wins + tag-strip
    assert(alpha.getAs[Long]("fouls_committed") == 2L)
    assert(alpha.getAs[String]("metrics_extra").contains("\"position\":\"FW\""))
    val beta = out(1)
    assert(beta.isNullAt(beta.fieldIndex("shots_total"))) // em-dash null
    assert(beta.getAs[Long]("minutes") == 67L)
    assert(out(2).getAs[Long]("minutes") == 90L)
  }

  test("teamMatchStats: squad-href keying, synonym precedence, possession percent") {
    val html =
      """<table id="team_stats"><tbody>
        |  <tr><th><a href="/en/squads/abcd1234/Borussia-Dortmund">BVB</a></th>
        |      <td data-stat="possession">55%</td>
        |      <td data-stat="sh">10</td>
        |      <td data-stat="shots">12</td>
        |      <td data-stat="crs">7</td>
        |      <td data-stat="xg">1,4</td></tr>
        |  <tr><th>no squad link → skipped</th><td data-stat="sh">99</td></tr>
        |  <tr><th><a href="/en/squads/efgh5678/Bayern">FCB</a></th>
        |      <td data-stat="sot">3</td></tr>
        |</tbody></table>""".stripMargin
    val pages = Seq(("m1", html)).toDF("page_id", "html")
    val out = FbrefStats.teamMatchStats(pages, "html", Seq("page_id"))
      .orderBy("fbref_team_id").collect()
    assert(out.length == 2)
    val bvb = out(0)
    assert(bvb.getAs[String]("fbref_team_id") == "abcd1234")
    assert(bvb.getAs[Double]("possession") == 55.0)
    assert(bvb.getAs[Long]("shots_total") == 12L)  // "shots" beats "sh" (dict-order last wins)
    assert(bvb.getAs[Long]("corners") == 7L)       // crs synonym
    assert(bvb.getAs[Double]("xg") == 1.4)
    assert(out(1).getAs[Long]("shots_on_target") == 3L)
  }

  test("matchStatsFromLineitem: round-trip parse over synthesized pages") {
    val out = FbrefStats.matchStatsFromLineitem(spark, TestSpark.Sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // minutes always set; shots_total = qty+1 (override survived)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("minutes"))))
    assert(rows.forall(r => r.getAs[Long]("n_keys") == 4L || r.getAs[Long]("n_keys") == 5L))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("fouls_committed"))))
  }
}
