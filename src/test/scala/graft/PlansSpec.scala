package graft

import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {

  test("graft_fold_accents: native expression matches the UDF and codegens") {
    val df = spark.sql(
      "SELECT graft_fold_accents('José  Álvarez-López!') AS a, graft_fold_accents(NULL) AS b")
    val r = df.head()
    assert(r.getString(0) == "jose alvarez lopez")
    assert(r.isNullAt(1))
    // same semantics as the UDF path
    val both = evalExpr(
      expr("graft_fold_accents('1. FC Köln')"),
      graft.functions.Normalize.normalizeForMatching(lit("1. FC Köln")))
    assert(both.getString(0) == both.getString(1))
    // the expression participates in whole-stage codegen (no ScalaUDF node)
    val plan = spark.range(3)
      .selectExpr("graft_fold_accents(cast(id as string)) AS f")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  test("graft_simhash60: SQL-registered, null-safe, codegen (no UDF node)") {
    val r = spark.sql(
      "SELECT graft_simhash60('a b c') AS s, graft_simhash60(NULL) AS n").head()
    assert(!r.isNullAt(0) && r.isNullAt(1))
    // signature fits 60 bits
    assert((r.getLong(0) >>> 60) == 0L)
    val plan = spark.range(3)
      .selectExpr("graft_simhash60(cast(id as string)) AS s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  test("graft_fuzzy_ratio: exact thefuzz semantics via SQL") {
    val r = spark.sql(
      """SELECT graft_fuzzy_ratio('new york mets', 'new york meats') AS a,
        |       graft_fuzzy_ratio('abc', 'abc') AS b,
        |       graft_fuzzy_ratio('abc', NULL) AS c""".stripMargin).head()
    assert(r.getInt(0) == 96)
    assert(r.getInt(1) == 100)
    assert(r.isNullAt(2))
  }

  test("FuzzyRatioFolding rule: self-compare and literal pairs fold away") {
    import spark.implicits._
    val df = Seq("alpha", "beta").toDF("name").filter("name IS NOT NULL")
    val self = df.selectExpr("graft_fuzzy_ratio(name, name) AS r")
    // identical non-nullable children -> constant 100, no DP at runtime
    assert(!self.queryExecution.optimizedPlan.toString.contains("graft_fuzzy_ratio"))
    assert(self.collect().map(_.getInt(0)).toSeq == Seq(100, 100))
    val lits = spark.sql("SELECT graft_fuzzy_ratio('abc', 'abd') AS r FROM range(2)")
    assert(!lits.queryExecution.optimizedPlan.toString.contains("graft_fuzzy_ratio"))
    // still evaluates correctly when it can't fold
    val live = Seq(("abc", "abd")).toDF("a", "b")
      .selectExpr("graft_fuzzy_ratio(a, b) AS r")
    assert(live.head().getInt(0) == spark.sql("SELECT graft_fuzzy_ratio('abc','abd')").head().getInt(0))
  }

  test("expressions push through a real query (filter + project)") {
    import spark.implicits._
    val out = Seq("Bayern München", "José", "plain").toDF("name")
      .selectExpr("name", "graft_fold_accents(name) AS norm")
      .where("graft_fuzzy_ratio(norm, 'jose') > 90")
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "José")
  }

  test("TopKPerKey operator: matches window row_number, plans partial before the exchange") {
    import graft.plans.TopKPerKey
    import org.apache.spark.sql.expressions.Window
    val orders = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
    val k = 3
    val native = TopKPerKey(orders, k,
      keys = Seq(col("o_orderpriority")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc))
    val expected = orders
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= k).drop("rn")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(canon(native) == canon(expected))
    assert(native.columns.toSeq == orders.columns.toSeq)

    // physical shape: partial heap BELOW the hash exchange, final above it
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyPartial"), plan)
    assert(plan.contains("GraftTopKPerKeyFinal"), plan)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0, plan)
    assert(plan.indexOf("GraftTopKPerKeyFinal") < exchangeIdx &&
      exchangeIdx < plan.indexOf("GraftTopKPerKeyPartial"),
      s"expected final -> exchange -> partial layering:\n$plan")

    // ascending default + single key-less... er, multiple keys
    val multi = TopKPerKey(orders, 1,
      keys = Seq(col("o_orderpriority"), col("o_orderstatus")),
      order = Seq(col("o_orderdate"), col("o_orderkey")))
    val multiExpected = orders
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("o_orderpriority"), col("o_orderstatus"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))))
      .filter(col("rn") === 1).drop("rn")
    assert(canon(multi) == canon(multiExpected))
  }

  test("TopKPerKey: partial key cap degrades to pass-through without changing results") {
    import graft.plans.TopKPerKey
    import org.apache.spark.sql.expressions.Window
    val orders = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
    val k = 2
    // per-customer top-k: ~1500 distinct keys per run, far over the cap of
    // 3, so nearly every key takes the pass-through path
    def run() = TopKPerKey(orders, k,
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val uncapped = run()
    spark.conf.set("spark.graft.topk.maxPartialKeys", "3")
    val capped = try run()
    finally spark.conf.unset("spark.graft.topk.maxPartialKeys")
    val expected = orders
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= k).drop("rn")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(uncapped == expected)
    assert(capped == expected, "pass-through partial must not change results")
  }

  test("graft_fuzzy_ratio: exact-.5 scores round half-to-even like thefuzz") {
    // LCS=1, D2=14, score = 100*2/16 = 12.5 exactly; thefuzz's
    // int(round(12.5)) = 12 (Python banker's rounding). Math.round gave
    // 13 — the cross-engine pair was consistent but diverged from the
    // reference on every exact-.5 score with an even floor.
    val r = spark.sql(
      "SELECT graft_fuzzy_ratio('axxxxxxx', 'ayyyyyyy') AS a").head()
    assert(r.getInt(0) == 12, s"expected banker's 12, got ${r.getInt(0)}")
    assert(graft.functions.Normalize.ratio("axxxxxxx", "ayyyyyyy") == 12,
      "UDF twin must share the half-to-even rounding")
  }

  test("graft function builders reject wrong arity with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_fold_accents('a', 'b')").collect()
    }
    assert(e.getMessage.contains("graft_fold_accents"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_fuzzy_ratio('a')").collect()
    }
    assert(e2.getMessage.contains("graft_fuzzy_ratio"), e2.getMessage)
  }

  test("TopKPerKey: NaN keys with distinct bit patterns form ONE key group") {
    import graft.plans.TopKPerKey
    import spark.implicits._
    // Two different NaN encodings + a normal key. Spark 4's UnsafeWriter
    // stores raw double bits (no NaN canonicalization — that lives in
    // the NormalizeFloatingNumbers rule, which only rewrites operators
    // it knows), so without key normalization in TopKPerKeyStrategy the
    // two NaNs would land in different groups and BOTH emit.
    val bitsOf = udf((which: Int) => which match {
      case 0 => java.lang.Double.longBitsToDouble(0x7ff8000000000000L) // canonical NaN
      case 1 => java.lang.Double.longBitsToDouble(0x7ff8000000000001L) // payload NaN
      case _ => 1.0
    })
    val df = Seq((0, 10L), (1, 20L), (2, 30L)).toDF("which", "v")
      .withColumn("key", bitsOf(col("which")))
      .select("key", "v")
    val out = TopKPerKey(df, 1, keys = Seq(col("key")),
      order = Seq(col("v").asc)).collect()
    // one NaN group (keeps v=10) + the 1.0 group (v=30)
    assert(out.length == 2,
      s"NaN bit patterns split the key group: ${out.mkString(", ")}")
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(10L, 30L))
  }

  test("TopKPerKey rejects map-typed keys") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
      .withColumn("m", map(col("a"), col("b")))
    // the guard lives in the planner strategy (keys are resolved there),
    // so it fires when the plan materializes
    val e = intercept[Exception] {
      graft.plans.TopKPerKey(df, 1, keys = Seq(col("m")), order = Seq(col("a")))
        .collect()
    }
    assert(e.getMessage.contains("map"), e.getMessage)
  }
}
