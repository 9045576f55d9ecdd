package graft

import graft.scale.Silver

/** Contract tests for the silver materialization seam. */
class SilverSpec extends SparkSpec {

  test("scratch: two runs sharing one silver dir do not overwrite each other") {
    // newSession(): own conf over the shared context, so setting the
    // silver dir cannot leak into other suites.
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("graft_silver").toString
    s2.conf.set("spark.graft.silver.dir", tmp)
    val df1 = Silver.scratch(s2.range(10).toDF("v"), "scratch_test")
    val df2 = Silver.scratch(s2.range(20).toDF("v"), "scratch_test")
    // With a FIXED name the second write would have clobbered df1's
    // parquet mid-read; per-call suffixes keep both frames intact.
    assert(df1.count() == 10)
    assert(df2.count() == 20)
    val dirs = new java.io.File(tmp).list().count(_.startsWith("scratch_test_"))
    assert(dirs == 2, s"expected two distinct scratch tables, saw $dirs")
  }

  test("materialize: fixed-name silver tables land at the configured path") {
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("graft_silver2").toString
    s2.conf.set("spark.graft.silver.dir", tmp)
    val df = Silver.materialize(s2.range(5).toDF("v"), "named_table")
    assert(df.count() == 5)
    assert(new java.io.File(s"$tmp/named_table").isDirectory)
  }
}
