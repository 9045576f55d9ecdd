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

  /** Exact key-distribution profile of `df` grouped by `key` — the
    * DIAGNOSIS step before [[saltedJoin]]: is this key skewed enough to
    * salt, and by what factor? One row: key cardinality, total rows,
    * max/p50/p90/p99 per-key counts (EXACT order statistics, not
    * approximate), and `skew_x1000` = 1000·max/avg — the replication
    * factor a uniform spread of the hottest key would need.
    *
    * Percentiles are positional (value at row ⌈p·n⌉ of the counts sorted
    * by (cnt, key) — a unique total order, so both engines select the
    * same row). At scale the counts frame is keys-sized (already
    * aggregated); its order statistics go through
    * [[Ranking.distributedGlobalRank]] — a parallel range sort, never a
    * single-partition window — and the three percentile picks are
    * filters on the ranked frame. */
  def keyProfile(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
    val ranked = Ranking.distributedGlobalRank(
      counts, Seq(col("cnt").asc, col("k").asc))
    def pick(p: Int) = ranked
      .filter(col("rank") === expr(s"(n * $p + 99) div 100")) // integer ⌈p·n/100⌉
      .select(col("cnt"))
    val agg = ranked.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"))
    agg
      .crossJoin(broadcast(pick(50).select(col("cnt").as("p50"))))
      .crossJoin(broadcast(pick(90).select(col("cnt").as("p90"))))
      .crossJoin(broadcast(pick(99).select(col("cnt").as("p99"))))
      .withColumn("skew_x1000",
        expr("(1000 * max_cnt * n_keys) div total_rows"))
  }

  /** q_skew_profile: the lineitem order-key distribution — the join key
    * every TPC-H-shaped workload shuffles on. */
  def skewProfileQuery(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame =
    keyProfile(graft.sources.Tables.lineitem(spark, dir), col("l_orderkey"))

  /** Exact equi-join output-size prediction from per-key count profiles:
    * |A ⋈ B| = Σ_k cntA(k)·cntB(k). At 100 TB this is the pre-flight
    * check before committing to a join order / broadcast choice — the
    * profiles are key-cardinality-sized (tiny next to the fact tables),
    * and the SUM is exact, not a sketch, so a surprise fan-out (hidden
    * many-to-many) is caught before the shuffle, not during it. Returns
    * one row: common-key count and the predicted output size. */
  def joinSizeEstimate(a: DataFrame, ka: Column,
                       b: DataFrame, kb: Column): DataFrame = {
    val ca = a.groupBy(ka.as("k")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(kb.as("k")).agg(count(lit(1)).as("cb"))
    ca.join(cb, "k").agg(
      count(lit(1)).as("n_keys_common"),
      sum(col("ca") * col("cb")).as("predicted_rows"))
  }

  /** q_join_size: predicted vs MEASURED size of orders ⋈ lineitem — the
    * prediction identity (`predicted_rows = actual_rows`, exactly) is the
    * correctness witness, checked cross-engine. */
  def joinSizeQuery(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    val o = graft.sources.Tables.orders(spark, dir)
    val li = graft.sources.Tables.lineitem(spark, dir)
    val actual = o.select("o_orderkey")
      .join(li.select("l_orderkey"), col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("actual_rows"))
    joinSizeEstimate(o, col("o_orderkey"), li, col("l_orderkey"))
      .crossJoin(broadcast(actual))
  }
}
