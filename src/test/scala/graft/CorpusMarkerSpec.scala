package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stale-output-dir trap, enforced by tooling (r12 verdict, next #4):
  * graft.Verify stamps its output dir with a corpus marker, and
  * tools/compare.py refuses to pair outputs whose marker mismatches the
  * corpus it is asked to compare against. These tests drive the REAL
  * compare.py (the marker check runs before any DuckDB work, so the
  * refusal paths are cheap). */
class CorpusMarkerSpec extends AnyFunSuite {

  private def outDirWith(markerFor: Option[String]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_marker_spec")
    markerFor.foreach(sf => graft.tools.CorpusMarker.write(sf, d.toString))
    // empty oracle map: a matching marker lets compare.py proceed to a
    // trivially green 0-query run, isolating the marker behavior
    java.nio.file.Files.writeString(d.resolve("oracle_sql.json"), "{}")
    d.toString
  }

  private def runCompare(sfDir: String, outDir: String): (Int, String) = {
    val buf = new StringBuilder
    val logger = scala.sys.process.ProcessLogger(
      l => { buf.append(l).append('\n'); () },
      l => { buf.append(l).append('\n'); () })
    val rc = scala.sys.process
      .Process(Seq("python3", "tools/compare.py", sfDir, outDir)).!(logger)
    (rc, buf.toString)
  }

  test("compare.py refuses outputs whose marker names a different corpus") {
    val out = outDirWith(Some(TestSpark.Sf0001))
    val (rc, log) = runCompare("/root/testdata/sf0.01", out)
    assert(rc != 0, s"mismatched marker was accepted:\n$log")
    assert(log.contains("corpus marker mismatch"), log)
  }

  test("compare.py refuses an output dir with no marker at all") {
    val out = outDirWith(None)
    val (rc, log) = runCompare(TestSpark.Sf0001, out)
    assert(rc != 0, s"markerless dir was accepted:\n$log")
    assert(log.contains("no corpus_marker.json"), log)
  }

  test("compare.py refuses a torn Verify run (marker present, oracle json absent)") {
    // oracle_sql.json is written LAST by Verify; a dir with a marker
    // but no oracle file is a mid-run crash — clean refusal, no trace
    val d = java.nio.file.Files.createTempDirectory("graft_marker_spec")
    graft.tools.CorpusMarker.write(TestSpark.Sf0001, d.toString)
    val (rc, log) = runCompare(TestSpark.Sf0001, d.toString)
    assert(rc != 0, s"torn Verify dir was accepted:\n$log")
    assert(log.contains("no oracle_sql.json"), log)
  }

  test("compare.py accepts a marker matching its corpus argument") {
    val out = outDirWith(Some(TestSpark.Sf0001))
    val (rc, log) = runCompare(TestSpark.Sf0001, out)
    assert(rc == 0, s"matching marker was refused:\n$log")
  }

  test("subset guard: mismatched marker refuses, matching or empty dir allows") {
    // r13 ADVICE: a SUBSET Verify run (dev-loop `only` arg) into a dir
    // stamped from a different corpus must refuse rather than re-stamp —
    // re-stamping would hand compare.py a mixed-corpus dir its marker
    // gate accepts. Full runs rewrite everything, so only subsets guard.
    import graft.tools.CorpusMarker
    val stale = outDirWith(Some("/root/testdata/sf0.01"))
    val e = intercept[IllegalArgumentException] {
      CorpusMarker.assertSubsetCompatible(TestSpark.Sf0001, stale)
    }
    assert(e.getMessage.contains("different corpus"), e.getMessage)
    // matching marker: allowed
    val matching = outDirWith(Some(TestSpark.Sf0001))
    CorpusMarker.assertSubsetCompatible(TestSpark.Sf0001, matching)
    // no marker, but pre-marker outputs present: unknown corpus, refuse
    val preMarker = java.nio.file.Files.createTempDirectory("graft_marker_spec")
    java.nio.file.Files.createDirectory(preMarker.resolve("q_old.parquet"))
    val e2 = intercept[IllegalArgumentException] {
      CorpusMarker.assertSubsetCompatible(TestSpark.Sf0001, preMarker.toString)
    }
    assert(e2.getMessage.contains("pre-marker outputs"), e2.getMessage)
    // fresh/empty dir: allowed
    val fresh = java.nio.file.Files.createTempDirectory("graft_marker_spec")
    CorpusMarker.assertSubsetCompatible(TestSpark.Sf0001, fresh.toString)
  }

  test("full-run prep clears stale-corpus outputs before the new stamp") {
    // "stamp first, rewrite second" would leave a killed full run's
    // old-corpus outputs under a fresh matching marker — a mixed-corpus
    // dir the gate accepts. clearStaleOutputs deletes Verify-shaped
    // entries (query dirs, oracle json, marker) when the existing
    // marker mismatches, leaves matching dirs untouched, and spares
    // foreign regular files.
    import graft.tools.CorpusMarker
    val names = Set("q_old", "q_keep")
    val stale = java.nio.file.Files.createTempDirectory("graft_marker_spec")
    CorpusMarker.write("/root/testdata/sf0.01", stale.toString)
    java.nio.file.Files.createDirectory(stale.resolve("q_old"))
    java.nio.file.Files.writeString(stale.resolve("oracle_sql.json"), "{}")
    java.nio.file.Files.writeString(stale.resolve("unrelated.txt"), "keep")
    java.nio.file.Files.createDirectory(stale.resolve("unrelated_dir"))
    CorpusMarker.clearStaleOutputs(TestSpark.Sf0001, stale.toString, names)
    assert(!java.nio.file.Files.exists(stale.resolve("q_old")),
      "stale query output survived the clear")
    assert(!java.nio.file.Files.exists(stale.resolve("oracle_sql.json")))
    assert(java.nio.file.Files.exists(stale.resolve("unrelated.txt")),
      "foreign file was deleted")
    // deletion is scoped to the query registry: a directory NOT named
    // in it survives, so an arg-swapped/mistyped outDir loses nothing
    assert(java.nio.file.Files.exists(stale.resolve("unrelated_dir")),
      "foreign directory was deleted — the clear must be name-scoped")
    // matching marker: nothing is touched
    val fresh = java.nio.file.Files.createTempDirectory("graft_marker_spec")
    CorpusMarker.write(TestSpark.Sf0001, fresh.toString)
    java.nio.file.Files.createDirectory(fresh.resolve("q_keep"))
    CorpusMarker.clearStaleOutputs(TestSpark.Sf0001, fresh.toString, names)
    assert(java.nio.file.Files.exists(fresh.resolve("q_keep")),
      "matching-corpus outputs must survive a full-run prep")
  }

  test("marker stats are deterministic and cover every corpus table") {
    val s1 = graft.tools.CorpusMarker.stats(TestSpark.Sf0001)
    assert(s1 == graft.tools.CorpusMarker.stats(TestSpark.Sf0001))
    val names = s1.map(_._1).toSet
    for (t <- Seq("lineitem.parquet", "documents.parquet", "embeddings.parquet"))
      assert(names.contains(t), s"missing $t in $names")
    assert(s1.forall { case (_, files, bytes, mtime) =>
      files > 0 && bytes > 0 && mtime > 0 })
  }
}
