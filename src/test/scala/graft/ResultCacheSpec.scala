package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tools.ResultCache

/** TTL result cache: plan-semantic keys, TTL expiry, cross-plan misses. */
class ResultCacheSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft_cache").toString

  private def query(minKey: Long) =
    graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .filter(col("o_orderkey") > minKey)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))

  test("second call serves the materialized entry; results identical") {
    var now = 1_000_000L
    val cache = new ResultCache(spark, freshDir(), ttlMs = 1000L, clock = () => now)
    val direct = query(10).orderBy("o_orderpriority").collect().toSeq
    assert(!cache.isCached(query(10)))
    val first = cache.get(query(10)).orderBy("o_orderpriority").collect().toSeq
    assert(cache.isCached(query(10)))
    val second = cache.get(query(10)).orderBy("o_orderpriority").collect().toSeq
    assert(first == direct && second == direct)
    // the served plan is a scan of the cache entry, not the original query
    val served = cache.get(query(10))
    assert(served.inputFiles.nonEmpty &&
      served.inputFiles.forall(_.contains("graft_cache")))
  }

  test("semantically equal plans share an entry; different constants miss") {
    var now = 1_000_000L
    val dir = freshDir()
    val cache = new ResultCache(spark, dir, ttlMs = 10_000L, clock = () => now)
    cache.get(query(10))
    // an independently constructed identical query (fresh expression ids)
    // canonicalizes to the same plan key
    val rebuilt = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .filter(col("o_orderkey") > 10L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    assert(cache.isCached(rebuilt))
    assert(!cache.isCached(query(11)), "different filter constant must miss")
  }

  test("corrupt pointer file means recompute, never a crash") {
    var now = 1_000_000L
    val dir = freshDir()
    val cache = new ResultCache(spark, dir, ttlMs = 10_000L, clock = () => now)
    cache.get(query(10))
    // clobber every entry's pointer with garbage
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).forEach { e =>
      java.nio.file.Files.writeString(e.resolve("_latest"), "not-a-timestamp")
    }
    assert(!cache.isCached(query(10)))
    // and get() recovers by rewriting a fresh version
    assert(cache.get(query(10)).count() > 0)
    assert(cache.isCached(query(10)))
  }

  test("refresh does not break a reader of the previous version") {
    var now = 1_000_000L
    val dir = freshDir()
    val cache = new ResultCache(spark, dir, ttlMs = 1000L, clock = () => now)
    val served = cache.get(query(10)) // resolves version v1000000
    now += 2000 // expire, then refresh writes a NEW version directory
    cache.get(query(10))
    // the old version's files still exist; the stale reader still works
    assert(served.count() > 0)
  }

  test("TTL expiry recomputes; fresh entries do not") {
    var now = 1_000_000L
    val dir = freshDir()
    val cache = new ResultCache(spark, dir, ttlMs = 1000L, clock = () => now)
    cache.get(query(10))
    now += 999
    assert(cache.isCached(query(10)))
    now += 2
    assert(!cache.isCached(query(10)), "entry past TTL must expire")
    cache.get(query(10)) // rewrites
    assert(cache.isCached(query(10)))
    cache.invalidateAll()
    assert(!cache.isCached(query(10)))
  }
}
