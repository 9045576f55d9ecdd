package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TTL-bounded query-result cache — the Spark form of the reference's
  * analytics result cache (src/analytics/engine.py:262-292: 24 h TTL,
  * string-keyed, serving repeated dashboard queries without re-hitting
  * PostgreSQL).
  *
  * The cache key is the CANONICALIZED LOGICAL PLAN: the entry directory
  * is named by the sha-256 of the canonical plan string (expression ids
  * normalized away, so independently built instances of the same query
  * share an entry), and any change to the plan — different filter
  * constant, new source path — misses automatically. That removes the
  * reference's stale-key failure mode (engine.py keys by method name +
  * params, so a changed underlying table serves stale results silently
  * for 24 h; here the table PATH is part of the plan and therefore of
  * the key — only in-place mutation of a cached input can still serve
  * stale data, which the TTL bounds). The directory name uses the first
  * 128 bits of the SHA-256 digest — a 50% birthday collision needs ~2^64
  * cached queries, unreachable in practice; a 32-bit `semanticHash`
  * would collide with ~50% probability around 77k cached queries and
  * silently serve one query's rows as another's.
  *
  * Entries are versioned parquet directories: a writer materializes into
  * a fresh `v<timestamp>` subdirectory and then atomically flips the
  * `_latest` pointer file. Readers resolve `_latest` once and scan that
  * immutable version, so a concurrent refresh never deletes files out
  * from under an in-flight read, and two racing writers each complete a
  * whole version with one winner — no interleaved half-entries.
  * Superseded versions are garbage (removed by [[invalidateAll]] or a
  * lifecycle rule on the shared prefix — the 100 TB form is an
  * object-store prefix shared by every session).
  *
  * Deliberately NOT `df.persist()`: persist pins executor memory/disk for
  * one session's lifetime; a dashboard-style cache must survive sessions
  * and cost nothing while idle.
  */
final class ResultCache(spark: SparkSession, cacheDir: String,
                        ttlMs: Long = 24L * 3600 * 1000,
                        clock: () => Long = () => System.currentTimeMillis()) {

  private def entryPath(df: DataFrame): Path = {
    val canonical = df.queryExecution.analyzed.canonicalized.toString
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes(StandardCharsets.UTF_8))
    Paths.get(cacheDir, "q_" + digest.take(16).map("%02x".format(_)).mkString)
  }

  /** Current fresh version subdirectory, or None when absent / expired /
    * corrupt (a malformed pointer means recompute, never a crash). */
  private def freshVersion(entry: Path): Option[Path] =
    try {
      val pointer = entry.resolve("_latest")
      if (!Files.exists(pointer)) None
      else {
        val Array(ts, version) = Files.readString(pointer).trim.split(":", 2)
        val age = clock() - ts.toLong
        val vdir = entry.resolve(version)
        if (age >= 0 && age < ttlMs && Files.isDirectory(vdir)) Some(vdir)
        else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Serve `df`'s result from the cache when a fresh entry exists;
    * otherwise execute it, write a new version, flip the pointer, and
    * serve the written copy (downstream consumers always read the
    * materialized form — one execution per TTL window no matter how many
    * readers). */
  def get(df: DataFrame): DataFrame = {
    val entry = entryPath(df)
    val current = freshVersion(entry).getOrElse {
      val now = clock()
      // Version dir name includes the writer's pid+thread id: writers
      // racing within the same clock millisecond (same or different
      // sessions — the prefix is shared) must land in DISTINCT immutable
      // version dirs; same-name writers with mode(overwrite) would
      // interleave/delete each other's files mid-write. Last pointer
      // flip wins; the loser's version is orphaned garbage.
      val writerId = s"${ProcessHandle.current().pid()}.${Thread.currentThread().getId}"
      val vname = s"v$now.$writerId"
      val vdir = entry.resolve(vname)
      df.write.mode("overwrite").parquet(vdir.toString)
      val tmp = entry.resolve(s"_latest.tmp.$now.$writerId")
      Files.writeString(tmp, s"$now:$vname")
      Files.move(tmp, entry.resolve("_latest"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      vdir
    }
    spark.read.parquet(current.toString)
  }

  /** True when a fresh entry exists for this plan (no side effects). */
  def isCached(df: DataFrame): Boolean = freshVersion(entryPath(df)).nonEmpty

  /** Drop every entry and stale version (test/ops hook). */
  def invalidateAll(): Unit = {
    val dir = Paths.get(cacheDir)
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
