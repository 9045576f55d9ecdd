package graft.tools

/** Corpus-signature marker pairing a `graft.Verify` output dir with the
  * exact corpus it was computed from (r12 verdict, next #4).
  *
  * The incident this kills: Verify runs overwrite shared output paths
  * (e.g. /tmp/verify_out); a later sweep at a DIFFERENT scale factor
  * silently replaces the outputs, and a "resumed" oracle compare then
  * pairs mismatched scales — in round 12 that forced a full 100×
  * pipeline re-run. The discipline was procedural ("always pair a fresh
  * Verify with its own dir"); this makes the tooling enforce it:
  * Verify writes `corpus_marker.json` into its output dir, and
  * tools/compare.py recomputes the same stats from ITS corpus argument
  * and refuses to compare on any mismatch (or a missing marker).
  *
  * Marker content, per top-level `*.parquet` table entry (file or
  * Spark-written directory): recursive regular-file count, total bytes,
  * and max mtime in WHOLE SECONDS. Seconds, not millis: Java's
  * File.lastModified and Python's st_mtime_ns agree exactly once both
  * are floored to seconds, while sub-second precision differs by
  * filesystem and copy tool. File count + bytes catch the actual
  * incident class (different SF = different sizes); mtime catches an
  * in-place rewrite that happens to preserve sizes. Entry order in the
  * JSON is sorted, so the file is byte-stable for a given corpus.
  */
object CorpusMarker {

  val FileName = "corpus_marker.json"

  /** (files, bytes, maxMtimeSeconds) per top-level table entry. */
  def stats(sfDir: String): Seq[(String, Long, Long, Long)] = {
    val root = new java.io.File(sfDir)
    val entries = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    entries.toSeq.map { e =>
      var files = 0L; var bytes = 0L; var mtime = 0L
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
        else {
          files += 1; bytes += f.length()
          mtime = math.max(mtime, f.lastModified() / 1000L)
        }
      walk(e)
      (e.getName, files, bytes, mtime)
    }
  }

  /** The exact marker body [[write]] produces — byte-stable for a given
    * corpus (sorted entries), so marker equality can be checked as plain
    * string equality against an existing file. */
  def render(sfDir: String): String = {
    val body = stats(sfDir).map { case (name, files, bytes, mtime) =>
      s""""$name":[$files,$bytes,$mtime]"""
    }.mkString(",")
    val canonical = new java.io.File(sfDir).getCanonicalPath
      .replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"sf_dir":"$canonical","tables":{$body}}"""
  }

  def write(sfDir: String, outDir: String): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, FileName), render(sfDir))

  /** The `"tables":{...}` portion of a marker string — the corpus
    * identity compared by both guards (path excluded; see
    * [[assertSubsetCompatible]]). A marker without it is corrupt and
    * compares unequal to every rendered marker. */
  private def tablesOf(s: String): String = {
    val i = s.indexOf("\"tables\":")
    if (i < 0) "corrupt-marker:" + s else s.substring(i)
  }

  /** FULL-run preparation of an existing output dir: when the dir's
    * marker was written from a DIFFERENT corpus (or prior outputs
    * predate the marker), delete the stale query outputs before the run
    * stamps the new marker. Rationale: a full run rewrites every output
    * it attempts, but "stamp first, then rewrite" leaves a window — a
    * killed run, or one query failing into Verify's per-query catch,
    * leaves old-corpus parquet under a marker that matches the NEW
    * corpus, a mixed-corpus dir the gate then accepts. Clearing first
    * makes the marker truthful from the moment it is written: anything
    * missing afterwards is a loudly-absent output, not a silently-stale
    * one.
    *
    * Deletion is scoped to entries THIS tool owns: directories named in
    * `queryNames` (the caller's query registry), oracle_sql.json, and
    * the marker. Everything else — including foreign DIRECTORIES — is
    * untouched, so a mistyped or arg-swapped outDir (a corpus dir, a
    * repo checkout) loses nothing. Any failed delete aborts BEFORE the
    * new marker can be stamped: a surviving stale output under a fresh
    * matching marker is the exact silently-mixed state this exists to
    * prevent. */
  def clearStaleOutputs(sfDir: String, outDir: String,
                        queryNames: Set[String]): Unit = {
    val dir = new java.io.File(outDir)
    if (!dir.isDirectory) return
    val markerPath = java.nio.file.Paths.get(outDir, FileName)
    val rendered = render(sfDir)
    val markerMatches = java.nio.file.Files.exists(markerPath) &&
      tablesOf(java.nio.file.Files.readString(markerPath)) == tablesOf(rendered)
    if (markerMatches) return
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      require(f.delete() || !f.exists(),
        s"could not delete stale output $f — aborting before the new " +
          "corpus marker could mask it as current")
    }
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if ((f.isDirectory && queryNames.contains(f.getName)) ||
          f.getName == "oracle_sql.json" || f.getName == FileName) rm(f)
    }
  }

  /** Guard for SUBSET re-runs into an existing output dir (`Verify`'s
    * dev-loop `only` arg): re-stamping the marker while other query
    * outputs remain from a different corpus would hand compare.py a
    * mixed-corpus dir that its marker gate accepts. A subset run is only
    * allowed into (a) a dir whose existing marker matches this corpus
    * byte-for-byte, or (b) a dir with no prior query outputs. Full runs
    * rewrite every output, so they may stamp unconditionally.
    *
    * The sf_dir PATH is excluded from the equality check (only the
    * `tables` stats object is compared): two paths to the same corpus
    * files — a symlink, a bind mount — are the same corpus for
    * compare.py, whose own gate also compares stats only. A COPY with
    * fresh mtimes is a different corpus by design (stats embed per-file
    * mtime seconds, precisely to catch in-place rewrites), so a copied
    * corpus needs its own fresh Verify run — compare.py would refuse
    * the pairing for the same reason. */
  def assertSubsetCompatible(sfDir: String, outDir: String): Unit = {
    val markerPath = java.nio.file.Paths.get(outDir, FileName)
    if (java.nio.file.Files.exists(markerPath)) {
      val existing = java.nio.file.Files.readString(markerPath)
      require(tablesOf(existing) == tablesOf(render(sfDir)),
        s"subset Verify into $outDir refused: its corpus marker was " +
          s"written from a different corpus than $sfDir — re-stamping " +
          "would mix scales behind compare.py's gate. Use a fresh dir.")
    } else {
      val prior = Option(new java.io.File(outDir).listFiles())
        .getOrElse(Array.empty).filterNot(_.getName == FileName)
      require(prior.isEmpty,
        s"subset Verify into $outDir refused: it holds pre-marker outputs " +
          s"(${prior.take(3).map(_.getName).mkString(", ")}…) whose corpus " +
          "is unknown. Use a fresh dir.")
    }
  }
}
