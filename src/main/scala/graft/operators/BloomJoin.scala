package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.Analytics
import graft.sources.Tables

/** Bloom-prefiltered joins: exact join semantics, most of the probe-side
  * shuffle eliminated by a broadcast Bloom filter.
  *
  * The scenario: the probe side is the 100 TB fact table; the build side
  * is too large to broadcast as a hash relation but its KEYS fit in a
  * Bloom filter (~10 bits/key at 1% fpp — 100 M keys ≈ 120 MB, vs
  * several GB as a broadcast hash table). One pass over the build side
  * constructs the filter (tree-aggregated, driver merges partial
  * filters); the probe side then drops non-matching rows map-side BEFORE
  * the shuffle. Spark's own runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) injects the same
  * shape automatically for selective equi-joins; this operator makes it
  * explicit, available to anti-join flows the optimizer won't touch, and
  * independent of join-selectivity heuristics.
  *
  * Correctness: a Bloom filter has false positives but NO false
  * negatives, so
  *  - semi join: mightContain=false rows are definitely unmatched → drop
  *    them map-side; survivors still go through the exact join, which
  *    kills the false positives. Result ≡ plain semi join.
  *  - anti join: mightContain=false rows are definitely in the answer →
  *    emit them WITHOUT shuffling; only the (small) maybe fraction goes
  *    through the exact anti join. Result ≡ plain anti join.
  *
  * The 100 TB win for anti join is structural: a plain left_anti shuffles
  * the entire probe side; here only |matches| + fpp·|probe| rows shuffle.
  */
object BloomJoin {

  /** Serialized Bloom filter over `xxhash64(key)` of the build side,
    * computed with Spark's native `BloomFilterAggregate` (the same
    * expression the optimizer's runtime row-level filtering injects —
    * partial filters merge executor-side, one binary reaches the driver,
    * exactly like `df.stat.bloomFilter`'s tree aggregate).
    *
    * Returns null for an EMPTY build side (the aggregate's no-input
    * result) — callers must special-case it, a null literal would make
    * the probe predicate null out both filter branches.
    *
    * BloomFilterAggregate silently clamps its sizing to the runtime-
    * filter conf caps (maxNumItems 4M / maxNumBits 64M by default) —
    * far below the "build side keys fit in a filter, not a hash
    * relation" scale this operator exists for. The caps are raised on a
    * CLONED session (`spark.newSession()`: shared SparkContext and
    * catalog, isolated SQLConf) and the build job runs there, so a
    * concurrent query planning on the caller's session never observes
    * the inflated caps and no restore can race another build. */
  private def buildFilter(small: DataFrame, key: String,
                          expectedItems: Long, fpp: Double): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val iso = small.sparkSession.newSession()
    iso.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      math.max(expectedItems, 4000000L).toString)
    iso.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
      math.max(numBits, 67108864L).toString)
    val build = Shims.ofRows(iso, small.queryExecution.analyzed)
    val agg = new BloomFilterAggregate(
      Shims.expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.agg(Shims.column(agg).as("bf")).head.getAs[Array[Byte]]("bf")
  }

  /** Probe-side membership test as a native codegen predicate:
    * `BloomFilterMightContain(<literal filter bytes>, xxhash64(key))` —
    * no Scala UDF, stays inside whole-stage codegen, Photon-translatable.
    * The filter ships as a foldable literal in the serialized plan (the
    * same mechanism the optimizer's injected scalar subquery reduces to
    * at execution). `xxhash64` is never null (a null key hashes to the
    * seed), so the predicate itself is null-safe; null keys simply route
    * through the exact-join branch, which resolves them correctly. */
  private def mightContain(filter: Array[Byte], key: Column): Column =
    Shims.column(new BloomFilterMightContain(
      Literal(filter, BinaryType), Shims.expression(xxhash64(key))))

  /** Exact left-semi join of `big` on `small`, Bloom-pruned map-side.
    * Key columns must be LongType (the fact-table FK case). */
  def semiJoin(big: DataFrame, bigKey: String,
               small: DataFrame, smallKey: String,
               expectedItems: Long = 1000000L,
               fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(small, smallKey, expectedItems, fpp)
    // empty build side → no filter to prune with; the exact semi join
    // against the empty key set returns the correct empty result
    val pruned =
      if (bytes == null) big else big.filter(mightContain(bytes, col(bigKey)))
    pruned
      .join(small.select(col(smallKey)).distinct(), col(bigKey) === col(smallKey), "left_semi")
  }

  /** Exact left-anti join of `big` on `small`: definite misses pass
    * through without shuffling; only Bloom-positive rows are verified by
    * the exact anti join. Two scans of `big` (each column-pruned) trade
    * for not shuffling it — the right trade when |matches| ≪ |big|. */
  def antiJoin(big: DataFrame, bigKey: String,
               small: DataFrame, smallKey: String,
               expectedItems: Long = 1000000L,
               fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(small, smallKey, expectedItems, fpp)
    // empty build side → anti join against nothing is the whole probe
    // side (a null filter literal would instead null out BOTH branches
    // and silently return zero rows)
    if (bytes == null) big
    else {
      val might = mightContain(bytes, col(bigKey))
      val misses = big.filter(!might)
      val verified = big.filter(might)
        .join(small.select(col(smallKey)).distinct(), col(bigKey) === col(smallKey), "left_anti")
      misses.unionByName(verified)
    }
  }

  /** q_bloom_prune: monthly revenue over lineitems whose part is NOT on
    * a blocklist (here: oversized parts, p_size ≥ 45) — the
    * "decontaminate the fact stream against a key blocklist" job. The
    * result is exactly the plain anti-join aggregate; the Bloom pass is
    * pure pruning. */
  def cleanMonthlyRevenue(spark: SparkSession, dir: String,
                          minSize: Int = 45): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    val blocked = Tables.part(spark, dir)
      .filter(col("p_size") >= minSize)
      .select(col("p_partkey"))
    antiJoin(li, "l_partkey", blocked, "p_partkey",
        expectedItems = 100000L, fpp = 0.01)
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("ship_month"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
      .orderBy("ship_month")
  }
}
