package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins (builder brief: "salting for skew").
  *
  * A shuffled equi-join sends every row of a hot key to one reducer; at
  * 100 TB a single viral key serializes the stage. Salting splits each hot
  * key into `factor` synthetic sub-keys: the large side gets a
  * deterministic salt from its row content, the small side is replicated
  * across all salts. Results are identical to the plain join; the hot
  * key's rows now spread over `factor` reducers.
  *
  * AQE's skew-join handles sort-merge cases adaptively; explicit salting
  * remains the tool for aggregations-after-join and for engines/plans AQE
  * can't split.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `keys`, salted `factor` ways.
    * Output columns = large.* ++ (small.* minus keys).
    *
    * Only `inner` and `left` are supported: the small side is replicated
    * once per salt, so for right/full-outer joins an unmatched small-side
    * row would surface `factor` times instead of once. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int = 8, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner/left only (got $joinType): replicated " +
        "small-side rows would duplicate unmatched outer rows")
    // Deterministic salt from the large row's full content: same data →
    // same partitioning (replayable), uniform across the hot key's rows.
    val salt = pmod(xxhash64(large.columns.map(col): _*), lit(factor))
    val saltedLarge = large.withColumn("__salt", salt)
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1)))).withColumn("__salt", col("__salt").cast("long"))
    val cond = (keys.map(k => saltedLarge(k) === saltedSmall(k)) :+
      (saltedLarge("__salt") === saltedSmall("__salt"))).reduce(_ && _)
    val dropCols = Seq(saltedSmall("__salt"), saltedLarge("__salt")) ++
      keys.map(saltedSmall(_))
    saltedLarge.join(saltedSmall, cond, joinType)
      .drop(dropCols.head, dropCols.tail: _*)
  }

  /** q_salted_join: orders ⋈ customer salted 8 ways, oracled against the
    * PLAIN SQL join — the result-identity claim ("salting never changes
    * the answer, only the reducer spread") checked cross-engine on the
    * full corpus rather than only on the spec's synthetic hot key. */
  def saltedOrdersQuery(spark: org.apache.spark.sql.SparkSession,
                        dir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val custs = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"),
        col("c_nationkey"))
    saltedJoin(orders, custs, Seq("o_custkey"), factor = 8)
      .orderBy("o_orderkey")
  }
}
