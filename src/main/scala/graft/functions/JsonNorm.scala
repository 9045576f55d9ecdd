package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Game-node JSON normalization (SURVEY.md §2.9 F25/F26 — reference
  * src/common/playwright_utils.py:332-398,429-520; tested in
  * tests/unit/test_utils.py): captured JSON arrives in many shapes —
  *
  *   teams:   {home:{...}} | {homeTeam:{...}} | {teams:{home:{...}}} |
  *            {participants:[{side:"home",...}, ...]}
  *   scores:  score:"2-1" | homeScore/awayScore | {scores:{ft:{home,away}}}
  *
  * — and flattens to {id, home, away, home_id, away_id, home_score,
  * away_score}. One permissive `from_json` schema covering every shape +
  * coalesce cascades; pure expressions, streaming-safe.
  */
object JsonNorm {

  private val team: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType)))

  val GameNodeSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("home", team), StructField("away", team),
    StructField("homeTeam", team), StructField("awayTeam", team),
    StructField("teams", StructType(Seq(
      StructField("home", team), StructField("away", team)))),
    StructField("participants", ArrayType(StructType(Seq(
      StructField("side", StringType),
      StructField("id", StringType),
      StructField("name", StringType))))),
    StructField("score", StringType),
    StructField("homeScore", IntegerType),
    StructField("awayScore", IntegerType),
    StructField("scores", StructType(Seq(
      StructField("ft", StructType(Seq(
        StructField("home", IntegerType), StructField("away", IntegerType)))))))))

  /** Parse a raw JSON string column into the permissive node struct. */
  def parseGameNode(raw: Column): Column = from_json(raw, GameNodeSchema)

  // get(arr, 0), not element_at(arr, 1): a node with a participants list
  // but no entry for this side must yield null for the coalesce to try
  // the next layout — element_at throws INVALID_ARRAY_INDEX under ANSI
  // mode on the empty filter result, killing the batch on one bad row.
  private def participant(node: Column, side: String): Column =
    get(filter(node.getField("participants"),
      p => p.getField("side") === side), lit(0))

  /** F26: flatten a parsed node to the canonical record. */
  def normalizeGameNode(node: Column): Column = {
    def teamField(side: String, field: String): Column = coalesce(
      node.getField(side).getField(field),
      node.getField(s"${side}Team").getField(field),
      node.getField("teams").getField(side).getField(field),
      participant(node, side).getField(field))

    val parsedScore = Parsing.parseScore(node.getField("score"))
    struct(
      node.getField("id").as("id"),
      teamField("home", "name").as("home"),
      teamField("away", "name").as("away"),
      teamField("home", "id").as("home_id"),
      teamField("away", "id").as("away_id"),
      coalesce(
        node.getField("homeScore"),
        parsedScore.getField("home_score"),
        node.getField("scores").getField("ft").getField("home")).as("home_score"),
      coalesce(
        node.getField("awayScore"),
        parsedScore.getField("away_score"),
        node.getField("scores").getField("ft").getField("away")).as("away_score"))
  }

  /** Raw JSON string → canonical flat record in one expression. */
  def normalizeGameJson(raw: Column): Column = normalizeGameNode(parseGameNode(raw))
}
