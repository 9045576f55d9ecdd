package graft

import org.apache.spark.sql.functions._

import graft.operators.{Joins, KMeans, Profile}
import graft.scale.{Dedup, Search}

/** Specs for the round-8 mining/profiling additions: k-means,
  * containment, sorted-neighborhood blocking, column profiling, PMI,
  * OOV, transitions, decay. The oracle queries pin cross-engine
  * exactness; these pin the SEMANTIC contracts on hand-built fixtures
  * (planted structure with known answers). */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- kmeans

  test("kmeans: two well-separated blobs are recovered exactly") {
    // Two tight groups far apart; seeds (vec_id 0,1) land one in each.
    val vecs = Seq(
      (0L, Array(0.10f, 0.10f)), (2L, Array(0.11f, 0.09f)),
      (4L, Array(0.09f, 0.11f)),
      (1L, Array(-0.80f, -0.80f)), (3L, Array(-0.79f, -0.81f)),
      (5L, Array(-0.81f, -0.79f))
    ).toDF("vec_id", "embedding")
    val q = vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor((x.cast("double") + 1d) * 10000d).cast("long")).as("q"))
    val a = KMeans.assignments(q, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(0L) == a(2L) && a(2L) == a(4L))
    assert(a(1L) == a(3L) && a(3L) == a(5L))
    assert(a(0L) != a(1L))
  }

  test("kmeans: assignment is total and ties break to the smaller cid") {
    // All points identical → every centroid is equidistant (dist 0);
    // the min-struct argmin must put everything in cluster 0.
    val vecs = (0L to 5L).map(i => (i, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val q = vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor((x.cast("double") + 1d) * 10000d).cast("long")).as("q"))
    val a = KMeans.assignments(q, k = 3, iters = 2).collect()
    assert(a.length == 6)
    assert(a.forall(_.getLong(1) == 0L))
    assert(a.forall(_.getLong(2) == 0L)) // dist 0
  }

  // ----------------------------------------------------------- containment

  test("containment flags a quoted subset that Jaccard misses") {
    // Doc 2 = the first 8 tokens of doc 1 (fully contained); doc 1 is 40
    // tokens long, so Jaccard is far below any sane threshold while
    // containment = 1.0.
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, big, "en"), (2L, quote, "en"),
      (3L, (100 to 140).map(i => s"x$i").mkString(" "), "en")
    ).toDF("doc_id", "text", "lang")
    val pairs = Dedup.containmentPairsFrom(docs, tauNum = 4, tauDen = 5)
      .collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L)
    assert(p.getAs[Double]("containment") == 1.0)
    // and the symmetric-resemblance path indeed misses it at 0.5
    assert(Dedup.jaccardPairsFrom(docs, threshold = 0.5).count() == 0)
  }

  // --------------------------------------------------- sorted neighborhood

  test("sorted-neighborhood pairs adjacent near-duplicates, linear candidates") {
    val recs = Seq(
      (1L, "alpha corp"), (2L, "alpha corpx"), // adjacent, dist 1
      (3L, "beta llc"), (4L, "gamma inc"),
      (5L, "zeta gmbh"), (6L, "zeta gmbi")     // adjacent, dist 1
    ).toDF("id", "name")
    val out = Joins.sortedNeighborhood(recs, col("id"), col("name"),
        w = 1, maxDist = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (5L, 6L)))
  }

  // ---------------------------------------------------------------- profile

  test("column profile counts nulls and exact distincts per column") {
    val df = Seq(
      (Some(1), "a"), (Some(1), "b"), (None, "b"), (Some(3), "c")
    ).toDF("k", "s")
    val p = Profile.columnProfile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(p("k") == ((4L, 1L, 2L, "1", "3")))
    assert(p("s") == ((4L, 0L, 3L, "a", "c")))
  }

  // -------------------------------------------------------------- pmi / oov

  test("PMI ranks an exclusive pair above a frequent-but-independent one") {
    // "rare pair" always co-occur (and only with each other);
    // "common world" co-occur but both words also appear alone a lot.
    val glue = (1 to 30).map(i => s"common f$i world").mkString(" ")
    val docs = Seq(
      (1L, Seq.fill(6)("rare pair").mkString(" ") + " " + glue)
    ).toDF("doc_id", "text")
    val out = Search.pmiCollocations(docs, minCount = 5L, topK = 10)
      .select("bigram", "score").as[(String, Double)].collect()
    val scores = out.toMap
    assert(scores.contains("rare pair"))
    assert(scores("rare pair") > scores.getOrElse("common f1", 0.0))
    assert(out.head._1 == "rare pair")
  }

  test("OOV rate: doc of hapaxes is fully OOV, repeated tokens are covered") {
    val docs = Seq(
      (1L, "t t t t"),      // 't' count 4 → in vocab
      (2L, "u1 u2 u3 u4")   // all singletons → all OOV at minCount=3
    ).toDF("doc_id", "text")
    val m = Search.oovRate(docs, minCount = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == ((4L, 0L)))
    assert(m(2L) == ((4L, 4L)))
  }

  // --------------------------------------------- transitions / decay / hist

  test("transition probabilities sum to 1 per source state") {
    val sums = graft.operators.EventOps.eventTransitions(spark, TestSpark.Sf0001)
      .groupBy("prev_type").agg(sum(col("p")).as("ps"))
      .select("ps").as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("decayed value: newest event dominates with 2x weighting") {
    val d = graft.operators.EventOps.decayedUserValue(spark, TestSpark.Sf0001)
      .collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      val (n, wtot) = (r.getLong(1), r.getLong(3))
      // weights are 2^15 .. 2^(16-n): their sum is 2^16 - 2^(16-n)
      assert(wtot == (1L << 16) - (1L << (16 - n.toInt)))
    }
  }

  // ------------------------------------------------------------- batch 3

  test("tfidf: a document's exclusive term outranks corpus-wide terms") {
    val docs = Seq(
      (1L, "shared shared shared zebra zebra"),
      (2L, "shared shared shared"),
      (3L, "shared shared shared")
    ).toDF("doc_id", "text")
    val top = Search.tfidfTopTerms(docs, k = 1)
      .filter(col("doc_id") === 1L).select("term").as[String].collect()
    assert(top.toSeq == Seq("zebra")) // tf·N/df: 2·3/1 = 6 beats 3·3/3 = 3
  }

  test("interval union: covered time is bounded by islands and events") {
    val iu = graft.operators.EventOps.intervalUnion(spark, TestSpark.Sf0001)
      .collect()
    assert(iu.nonEmpty)
    iu.foreach { r =>
      val (n, ms) = (r.getLong(1), r.getLong(2))
      assert(ms >= n * 300000L) // every merged island spans >= one interval
    }
  }

  test("autocorr/cluster-purity/degree-dist invariants on the corpus") {
    val ac = graft.operators.Regression.autocorrQuery(spark, TestSpark.Sf0001)
      .select("corr").as[Double].collect()
    assert(ac.nonEmpty && ac.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))

    val cp = graft.operators.KMeans.clusterPurityQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(cp.map(_.getLong(1)).sum ==
      graft.sources.Tables.embeddings(spark, TestSpark.Sf0001).count())
    cp.foreach(r => assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))

    val dd = graft.operators.KCore.degreeDistQuery(spark, TestSpark.Sf0001)
      .collect()
    dd.foreach { r =>
      val (b, n, sum, mn, mx) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn >= (1L << (b.toInt - 1)) && mx < (1L << b.toInt))
      assert(sum >= n * mn && sum <= n * mx)
    }
  }

  test("dataset card: per-source rows cover the corpus exactly") {
    val card = graft.scale.TrainingData
      .datasetCardQuery(spark, TestSpark.Sf0001).collect()
    val total = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(card.map(_.getLong(1)).sum == total)
    card.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // en_share
      assert(r.getLong(3) >= 1L)                             // n_langs
    }
  }

  // ------------------------------------------------------------- batch 4

  test("wow/mode/fano/dup-rate/hist2d invariants on the corpus") {
    val wow = graft.operators.Analytics.weekOverWeek(spark, TestSpark.Sf0001)
      .collect()
    assert(wow.nonEmpty)
    wow.foreach(r => // pct ≡ delta/v_prev by construction
      assert(r.getDouble(5) == r.getLong(4).toDouble / r.getLong(2)))

    val mode = graft.operators.Analytics.modalPriority(spark, TestSpark.Sf0001)
      .collect()
    assert(mode.length == 25) // every nation has a modal priority
    mode.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))            // mode_cnt <= n_orders
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }

    val fano = graft.operators.EventOps.dailyFano(spark, TestSpark.Sf0001)
      .select("fano").as[Double].collect()
    assert(fano.nonEmpty && fano.forall(_ >= 0.0))

    val dr = graft.scale.Dedup.dupRateBySource(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(dr("mirror") == 1.0) // every planted doc duplicates an original

    val h2 = graft.operators.Approx.hist2d(spark, TestSpark.Sf0001).collect()
    assert(h2.map(_.getLong(2)).sum ==
      graft.sources.Tables.lineitem(spark, TestSpark.Sf0001).count())
  }

  // ------------------------------------------------------------- batch 5

  test("conv-lag/seasonality/ab-lift/bipartite/simpson invariants") {
    val cl = graft.operators.EventOps.conversionLag(spark, TestSpark.Sf0001)
      .collect()
    assert(cl.nonEmpty)
    cl.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 6)        // dow domain
      assert(r.getLong(2) > 0 && r.getDouble(3) <= r.getLong(4).toDouble)
    }

    val se = graft.operators.EventOps.weekdaySeasonality(spark, TestSpark.Sf0001)
    val sums = se.groupBy("event_type").agg(sum(col("share")).as("s"))
      .select("s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))

    val ab = graft.operators.EventOps.abLift(spark, TestSpark.Sf0001).head()
    val purchases = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(ab.getLong(0) + ab.getLong(1) == purchases)

    val bp = graft.operators.Joins
      .bipartiteProjectionQuery(spark, TestSpark.Sf0001, k = 10).collect()
    assert(bp.nonEmpty)
    bp.foreach(r => assert(r.getLong(0) < r.getLong(1) && r.getLong(2) >= 1))
    assert(bp.map(_.getLong(2)).toSeq ==
      bp.map(_.getLong(2)).toSeq.sorted.reverse) // descending weights

    val si = graft.scale.TextAnalysis.languageSimpson(spark, TestSpark.Sf0001)
      .select("simpson").as[Double].collect()
    assert(si.nonEmpty && si.forall(s => s >= 0.0 && s <= 1.0))
  }

  // ------------------------------------------------------------- batch 6

  test("rfm/time-travel/graph-jaccard/coverage/keyness invariants") {
    val rfm = graft.operators.EventOps.rfmSegments(spark, TestSpark.Sf0001)
      .collect()
    assert(rfm.nonEmpty)
    rfm.foreach { r =>
      val (rc, fc, mc, code) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(Seq(rc, fc, mc).forall(c => c >= 1 && c <= 3))
      assert(code == rc * 100 + fc * 10 + mc)
    }

    val tt = graft.operators.EventOps.timeTravel(spark, TestSpark.Sf0001)
      .collect()
    assert(tt.nonEmpty)
    assert(tt.map(_.getLong(0)).distinct.length == tt.length) // one per user
    tt.foreach(r => assert(r.getLong(3) <= 1705708800000L))

    val gj = graft.operators.Joins.graphJaccardQuery(spark, TestSpark.Sf0001)
      .collect()
    gj.foreach { r =>
      val (sh, d1, d2, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(j == sh.toDouble / (d1 + d2 - sh) && j >= 0.25 && j <= 1.0)
    }

    val cov = graft.scale.Search.coverageQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(cov.map(_.getLong(1)).toSeq == cov.map(_.getLong(1)).toSeq.sorted)
    cov.foreach(r => assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))

    val key = graft.scale.Search.keynessQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(key.nonEmpty)
    assert(key.map(_.getDouble(3)).toSeq ==
      key.map(_.getDouble(3)).toSeq.sorted.reverse)
    key.foreach(r => assert(r.getLong(1) + r.getLong(2) >= 20L))
  }

  // ------------------------------------------------------------- batch 7

  test("paths/churn/gaps/anomaly/basket-lift/movers invariants") {
    val paths = graft.operators.EventOps.frequentPaths(spark, TestSpark.Sf0001)
      .collect()
    assert(paths.nonEmpty)
    assert(paths.map(_.getLong(1)).toSeq ==
      paths.map(_.getLong(1)).toSeq.sorted.reverse)
    paths.foreach(r => assert(r.getString(0).split(">").length == 3))

    val ch = graft.operators.EventOps.churn(spark, TestSpark.Sf0001).collect()
    val maxDay = ch.map(_.getLong(1)).max
    ch.foreach(r =>
      assert(r.getBoolean(3) == (r.getLong(1) < maxDay - 30)))

    val g = graft.operators.EventOps.purchaseGaps(spark, TestSpark.Sf0001).head()
    assert(g.getLong(0) > 0 && g.getLong(1) > 0)
    assert(g.getDouble(2) <= g.getDouble(3) && g.getDouble(3) <= g.getLong(4))

    val an = graft.operators.EventOps.anomalousDays(spark, TestSpark.Sf0001)
      .collect()
    assert(an.nonEmpty) // threshold chosen to be non-vacuous on the corpus

    val bl = graft.operators.Analytics.basketLift(spark, TestSpark.Sf0001)
      .collect()
    assert(bl.nonEmpty)
    bl.foreach { r => // lift ≡ c_ab·N/(c1·c2) sanity: positive, pairs ordered
      assert(r.getLong(0) < r.getLong(1) && r.getDouble(5) > 0.0)
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }

    val mv = graft.operators.Analytics.rankMovers(spark, TestSpark.Sf0001)
      .collect()
    assert(mv.length == 25)
    assert(mv.map(_.getLong(3)).sorted.toSeq == (1L to 25L)) // rank_h1 is a permutation
    assert(mv.map(_.getLong(4)).sorted.toSeq == (1L to 25L))
    mv.foreach(r => assert(r.getLong(5) == r.getLong(3) - r.getLong(4)))
  }

  // ------------------------------------------------------------- batch 8

  test("clustering/assortativity/hhi invariants on the corpus") {
    val cl = graft.operators.Triangles.clusteringQuery(spark, TestSpark.Sf0001)
      .head()
    val (wedges, tris, coef) = (cl.getLong(2), cl.getLong(3), cl.getDouble(4))
    assert(tris >= 0 && wedges >= tris * 3)       // every triangle is 3 wedges
    assert(coef == 3.0 * tris / wedges && coef >= 0.0 && coef <= 1.0)

    val as = graft.operators.Triangles
      .assortativityQuery(spark, TestSpark.Sf0001).head()
    val corr = as.getDouble(4)
    assert(corr >= -1.0 - 1e-9 && corr <= 1.0 + 1e-9)

    val hhi = graft.operators.Analytics.revenueHhi(spark, TestSpark.Sf0001)
      .collect()
    assert(hhi.nonEmpty) // sf0.001 has 10 suppliers across 10 nations
    hhi.foreach { r =>
      val (n, h) = (r.getLong(1), r.getDouble(3))
      assert(h > 0.0 && h <= 1.0)
      assert(h >= 1.0 / n - 1e-12) // HHI is minimized by an even split
    }
  }

  // ------------------------------------------------------------- batch 9

  test("gini/boxplot/benford/pareto invariants on the corpus") {
    val g = graft.operators.Analytics.spendGini(spark, TestSpark.Sf0001).head()
    assert(g.getDouble(2) >= 0.0 && g.getDouble(2) < 1.0)

    val bx = graft.operators.Analytics.segmentBoxplot(spark, TestSpark.Sf0001)
      .collect()
    assert(bx.nonEmpty)
    bx.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3))            // p25 <= p75
      assert(r.getDouble(5) <= r.getDouble(2))            // lo_fence <= p25
      assert(r.getLong(7) <= r.getLong(1))                // outliers <= n
    }

    val bf = graft.operators.Analytics.benfordDigits(spark, TestSpark.Sf0001)
      .collect()
    assert(bf.map(_.getString(0)).forall(d => d >= "1" && d <= "9"))
    assert(math.abs(bf.map(_.getDouble(2)).sum - 1.0) < 1e-9)

    val pa = graft.operators.Analytics.paretoCurve(spark, TestSpark.Sf0001)
      .collect()
    assert(pa.map(_.getLong(0)).toSeq == Seq(1L, 5L, 20L))
    // concentration: a larger top slice always covers at least as much,
    // and the top p% covers at least p% of revenue (sorted descending)
    assert(pa.map(_.getDouble(3)).toSeq == pa.map(_.getDouble(3)).toSeq.sorted)
    pa.foreach(r => assert(r.getDouble(3) >= r.getLong(0) / 100.0))
  }

  // ------------------------------------------------------------ batch 10

  test("growth-accounting/stickiness/label-balance invariants") {
    val ga = graft.operators.EventOps.growthAccounting(spark, TestSpark.Sf0001)
      .collect()
    assert(ga.nonEmpty)
    // conservation: total new across all weeks = distinct users
    val users = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .select("user_id").distinct().count()
    assert(ga.map(_.getLong(1)).sum == users)
    // week-over-week: retained(w) + churned(w) = active(w-1)
    val active = ga.map(r => r.getLong(0) ->
      (r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    ga.foreach { r =>
      val w = r.getLong(0)
      active.get(w - 1).foreach(prev =>
        assert(r.getLong(2) + r.getLong(4) == prev))
    }

    val st = graft.operators.EventOps.stickiness(spark, TestSpark.Sf0001)
      .collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2)) // wau <= mau
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }

    val lb = graft.scale.EmbedStats.labelBalanceQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(math.abs(lb.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(lb.count(_.getBoolean(3)) >= 1)
  }

  test("fused graft_cosine is bit-identical to the HOF cosine chain") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"),
        graft.scale.Similarity.asDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0L).select(col("v").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        graft.scale.Similarity.cosine(col("v"), col("qv")).as("fused"),
        graft.scale.Similarity.cosineHof(col("v"), col("qv")).as("hof"))
    // exact double equality — same accumulation order, not just closeness
    assert(both.filter(col("fused") =!= col("hof")).count() == 0)
    assert(both.count() == emb.count())
  }

  test("graft_cosine nulls out unequal lengths and null elements, like the HOF chain") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](3.0, 4.0), Seq[java.lang.Double](4.0, 3.0))
    ).toDF("a", "b")
      .select(
        graft.scale.Similarity.cosine(col("a"), col("b")).as("fused"),
        graft.scale.Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1)) // length mismatch
    assert(df(1).isNullAt(0) && df(1).isNullAt(1)) // null element
    assert(!df(2).isNullAt(0) && df(2).getDouble(0) == df(2).getDouble(1))
  }

  test("fused graft_sqdist_long matches the HOF zip_with/aggregate chain exactly") {
    val pts = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000000.0))).as("u"))
    val q = pts.filter(col("vec_id") === 0L).select(col("u").as("qu"))
    val both = pts.crossJoin(broadcast(q))
      .select(
        graft.scale.Similarity.sqDistLong(col("u"), col("qu")).as("fused"),
        aggregate(zip_with(col("u"), col("qu"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("hof"))
    assert(both.filter(col("fused") =!= col("hof")).count() == 0)
    assert(both.filter(col("fused") < 0L).count() == 0)
    // null contract: length mismatch and null elements null out
    import spark.implicits._
    val edge = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)),
      (Seq[java.lang.Long](3L, 4L), Seq[java.lang.Long](4L, 3L))
    ).toDF("a", "b")
      .select(graft.scale.Similarity.sqDistLong(col("a"), col("b")).as("d"))
      .collect()
    assert(edge(0).isNullAt(0) && edge(1).isNullAt(0))
    assert(edge(2).getLong(0) == 2L)
  }

  test("KS statistic is in [0,1] and zero for a segment against itself") {
    val ks = graft.operators.Distribution.ksTest(spark, TestSpark.Sf0001).head()
    assert(ks.getLong(0) > 0 && ks.getLong(1) > 0)
    val d = ks.getDouble(4)
    assert(d >= 0.0 && d <= 1.0)
    val self = graft.operators.Distribution
      .ksTest(spark, TestSpark.Sf0001, "BUILDING", "BUILDING").head()
    assert(self.getLong(2) == 0L && self.getDouble(4) == 0.0)
  }

  test("chi-square cells: nonnegative terms, totals reconcile with orders") {
    val cells = graft.operators.Distribution
      .chi2Contingency(spark, TestSpark.Sf0001).collect()
    val nOrders = graft.sources.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(cells.map(_.getLong(2)).sum == nOrders)
    cells.foreach { r =>
      assert(r.getDouble(3) > 0.0)      // expectation
      assert(r.getDouble(4) >= 0.0)     // chi2 term
    }
  }

  test("percentile bands are monotone and bracket the segment medians") {
    val b = graft.operators.Distribution
      .percentileBands(spark, TestSpark.Sf0001).collect()
    assert(b.length == 5)
    b.foreach { r =>
      val Seq(p25, p50, p75, p90) = Seq(2, 3, 4, 5).map(r.getLong)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90)
    }
  }

  test("debounce: kept+dropped conserves the stream; zero gap always drops") {
    val d = graft.operators.EventOps.debounceStats(spark, TestSpark.Sf0001)
      .collect()
    val nEvents = graft.sources.Tables.events(spark, TestSpark.Sf0001).count()
    assert(d.map(_.getLong(1)).sum == nEvents)
    d.foreach(r => assert(r.getLong(2) + r.getLong(3) == r.getLong(1)))
    // gapMs=0 never drops: every gap (ts strictly ordered per key or 0) >= 0
    val all = graft.operators.EventOps.debounceStats(spark, TestSpark.Sf0001, 0L)
      .collect()
    all.foreach(r => assert(r.getLong(3) == 0L))
  }

  test("nearest view is at least as close as both directional candidates") {
    import org.apache.spark.sql.expressions.Window
    val e = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val viewTs = when(col("event_type") === "view", col("ts_ms"))
    val both = e
      .withColumn("pv", max(viewTs).over(ord.rowsBetween(Long.MinValue, -1)))
      .withColumn("nv", min(viewTs).over(ord.rowsBetween(1, Long.MaxValue)))
      .filter(col("event_type") === "purchase")
    val got = graft.operators.EventOps.nearestViewToPurchase(spark, TestSpark.Sf0001)
    val joined = got.join(both.select("event_id", "pv", "nv"), "event_id")
    val bad = joined.filter(
      (col("pv").isNotNull && abs(col("delta_ms")) > col("ts_ms") - col("pv")) ||
      (col("nv").isNotNull && abs(col("delta_ms")) > col("nv") - col("ts_ms")))
    assert(bad.count() == 0)
    assert(got.count() == both.filter(col("pv").isNotNull || col("nv").isNotNull).count())
  }

  test("minhash calibration: exact jaccard bounds and err consistency") {
    val c = graft.scale.Dedup.minhashCalibration(spark, TestSpark.Sf0001)
      .collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      val (est, inter, uni, jac, err) =
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
      assert(est >= 0.5 && est <= 1.0)
      assert(inter <= uni && jac >= 0.0 && jac <= 1.0)
      assert(err == est - jac)
    }
  }

  test("local clustering: lcc in [0,1], triangle mass = 3T of the global query") {
    val lcc = graft.operators.Triangles
      .localClusteringQuery(spark, TestSpark.Sf0001)
    val rows = lcc.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)                       // deg filter
      assert(r.getLong(3) <= r.getLong(2))            // tri <= wedges
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    val triMass = rows.map(_.getLong(3)).sum
    val g = graft.operators.Triangles
      .clusteringQuery(spark, TestSpark.Sf0001).head()
    assert(triMass == 3L * g.getLong(3))
  }

  test("fk audit: child counts match table sizes; the synthetic corpus is closed") {
    val a = graft.operators.Profile.fkAudit(spark, TestSpark.Sf0001).collect()
    assert(a.length == 7)
    val byFk = a.map(r => r.getString(0) -> r.getLong(1)).toMap
    val nLi = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001).count()
    assert(byFk("lineitem.l_orderkey->orders.o_orderkey") == nLi)
    a.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
  }

  test("out-of-order audit counts a synthetic late stream correctly") {
    import spark.implicits._
    // user 1 / type t: arrival order 1,2,3 with times 10, 30, 20 — the
    // third event is 10ms behind the high-water mark.
    val ev = Seq(
      (1L, "t", 1L, 10L), (1L, "t", 2L, 30L), (1L, "t", 3L, 20L),
      (2L, "t", 4L, 5L), (2L, "t", 5L, 5L) // equal ts is NOT late
    ).toDF("user_id", "event_type", "event_id", "ts_ms")
    val r = graft.operators.EventOps.outOfOrderRateOf(ev).head()
    assert(r.getLong(1) == 5L)   // n_events
    assert(r.getLong(2) == 1L)   // n_late
    assert(r.getLong(3) == 10L)  // max_lateness_ms
    // and the real corpus is verified in-order (a true zero, not a skip)
    val corpus = graft.operators.EventOps
      .outOfOrderRate(spark, TestSpark.Sf0001).collect()
    assert(corpus.forall(_.getLong(2) == 0L))
  }

  test("langid eval: cells conserve the corpus; recall shares sum to 1 per label") {
    val cells = graft.scale.TextAnalysis.langIdEval(spark, TestSpark.Sf0001)
      .collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(cells.map(_.getLong(2)).sum == nDocs)
    cells.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    }
    cells.foreach(r =>
      assert(r.getBoolean(3) == (r.getString(0) == r.getString(1))))
  }

  test("boilerplate prefixes have support >= 2 and bounded source counts") {
    val b = graft.scale.TextAnalysis
      .boilerplatePrefixes(spark, TestSpark.Sf0001).collect()
    assert(b.nonEmpty && b.length <= 20)
    b.foreach { r =>
      assert(r.getString(0).split(" ").length == 5)
      assert(r.getLong(1) >= 2 && r.getLong(2) <= r.getLong(1))
    }
    // sorted by support desc
    val supports = b.map(_.getLong(1))
    assert(supports.zip(supports.tail).forall { case (a, c) => a >= c })
  }

  test("dedup savings reconcile with the exact-dup group structure") {
    val s = graft.scale.TextAnalysis.dedupSavings(spark, TestSpark.Sf0001)
      .collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(s.map(_.getLong(1)).sum == nDocs)
    // total removed = docs − distinct fingerprints
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val distinctFp = docs
      .select(graft.scale.TextAnalysis.fingerprint(col("text"))).distinct().count()
    assert(s.map(_.getLong(2)).sum == nDocs - distinctFp)
  }

  test("allocation: conserves the budget exactly, extras go to top remainders") {
    val a = graft.scale.TrainingData.budgetAllocation(spark, TestSpark.Sf0001)
      .collect()
    assert(a.map(_.getLong(5)).sum == 10000L)
    a.foreach(r => assert(r.getLong(5) - r.getLong(2) == (if (r.getBoolean(4)) 1L else 0L)))
    // every extra-receiving source has remainder >= every non-extra one
    val extras = a.filter(_.getBoolean(4)).map(_.getLong(3))
    val rest = a.filterNot(_.getBoolean(4)).map(_.getLong(3))
    if (extras.nonEmpty && rest.nonEmpty) assert(extras.min >= rest.max)
  }

  test("split leakage: conserves the corpus and matches a direct recompute") {
    val s = graft.scale.TrainingData.splitLeakage(spark, TestSpark.Sf0001)
      .collect()
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    assert(s.map(_.getLong(1)).sum == docs.count())
    val direct = docs
      .select(graft.scale.TextAnalysis.fingerprint(col("text")).as("fp"),
        graft.scale.TrainingData.splitOf(col("doc_id")).as("split"))
    val leakedFps = direct.select("fp", "split").distinct()
      .groupBy("fp").count().filter(col("count") > 1).select("fp")
    val leakedDocs = direct.join(leakedFps, "fp").count()
    assert(s.map(_.getLong(2)).sum == leakedDocs)
  }

  test("psi drift: full bucket spine, shares sum to 1, nonnegative chi terms") {
    val d = graft.operators.Distribution
      .distributionDrift(spark, TestSpark.Sf0001).collect()
    assert(d.map(_.getLong(0)).toSeq == (1L to 10L))
    assert(math.abs(d.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(d.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    d.foreach(r => assert(r.getDouble(6) >= 0.0))
    assert(math.abs(d.map(_.getDouble(5)).sum) < 1e-9) // shifts cancel
  }

  test("negative sampling: exact fan-out minus collisions, no positives sampled") {
    val pos = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .join(graft.sources.Tables.lineitem(spark, TestSpark.Sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("part"))
      .distinct()
    val neg = graft.scale.TrainingData.negativeSampling(spark, TestSpark.Sf0001)
    val nPos = pos.count()
    val nNeg = neg.count()
    assert(nNeg <= 3 * nPos && nNeg > 2 * nPos) // few hash collisions
    // no sampled negative is an observed positive
    val bad = neg.join(pos
        .withColumnRenamed("part", "neg_part"), Seq("user", "neg_part"))
    assert(bad.count() == 0)
    // deterministic: a second run is identical
    val again = graft.scale.TrainingData.negativeSampling(spark, TestSpark.Sf0001)
    assert(neg.exceptAll(again).count() == 0 && again.exceptAll(neg).count() == 0)
  }

  test("feature hash profile: bucket-loads conserve vocab and bucket count") {
    val h = graft.scale.TrainingData.featureHashProfile(spark, TestSpark.Sf0001)
      .collect()
    assert(h.map(_.getLong(1)).sum == 64L) // all buckets accounted for
    val vocab = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct().count()
    assert(h.map(r => r.getLong(0) * r.getLong(1)).sum == vocab)
  }

  test("heaps curve: monotone, ends at the full vocabulary size") {
    val h = graft.scale.Search.heapsCurve(spark, TestSpark.Sf0001).collect()
    assert(h.length == 10)
    val vs = h.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    val vocab = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct().count()
    assert(vs.last == vocab)
    val cuts = h.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(cuts.last == graft.sources.Tables
      .documents(spark, TestSpark.Sf0001).count())
  }

  test("k-anonymity: rows conserve; risk bounded by small-group mass") {
    val r = graft.operators.Profile.kAnonymity(spark, TestSpark.Sf0001).head()
    val nCust = graft.sources.Tables.customer(spark, TestSpark.Sf0001).count()
    assert(r.getLong(1) == nCust)
    assert(r.getLong(4) <= r.getLong(3) * (r.getLong(0) - 1)) // risk <= small*(k-1)
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
  }

  test("abc classes partition parts and revenue; A-share ~ 80%") {
    val a = graft.operators.Analytics.abcAnalysis(spark, TestSpark.Sf0001)
      .collect()
    val nParts = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001)
      .select("l_partkey").distinct().count()
    assert(a.map(_.getLong(1)).sum == nParts)
    assert(math.abs(a.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    val aShare = a.find(_.getString(0) == "A").map(_.getDouble(3)).getOrElse(0.0)
    assert(aShare <= 0.80 + 1e-9) // boundary rule: A stops at 80%
  }

  test("wilson bounds bracket the share and stay in [0,1]") {
    val w = graft.operators.EventOps.errorRateBounds(spark, TestSpark.Sf0001)
      .collect()
    assert(w.length == 24)
    w.foreach { r =>
      val (share, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= share && share <= hi)
      assert(lo >= 0.0 && hi <= 1.0)
    }
    val nEvents = graft.sources.Tables.events(spark, TestSpark.Sf0001).count()
    assert(w.map(_.getLong(1)).sum == nEvents)
  }

  test("weighted median splits the quantity mass at its value") {
    val wm = graft.operators.Distribution.weightedMedian(spark, TestSpark.Sf0001)
    val li = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001)
      .select(col("l_returnflag").as("rf"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("v"),
        col("l_quantity").cast("long").as("qty"))
    wm.collect().foreach { r =>
      val (rf, tot, med) = (r.getString(0), r.getLong(2), r.getLong(3))
      val below = li.filter(col("rf") === rf && col("v") < med)
        .agg(coalesce(sum(col("qty")), lit(0L))).head().getLong(0)
      val atOrBelow = li.filter(col("rf") === rf && col("v") <= med)
        .agg(sum(col("qty"))).head().getLong(0)
      assert(below * 2 < tot)       // strictly-below mass is under half
      assert(atOrBelow * 2 >= tot)  // including the median reaches half
    }
  }

  test("simpsons paradox: exact cross-multiplied directions are consistent") {
    val s = graft.operators.Distribution.simpsonsParadox(spark, TestSpark.Sf0001)
      .collect()
    assert(s.length == 5)
    val overall = s.map(_.getBoolean(6)).distinct
    assert(overall.length == 1) // one aggregate verdict repeated
    s.foreach { r =>
      assert(r.getBoolean(7) == (r.getBoolean(5) != r.getBoolean(6)))
      // direction agrees with the printed averages
      assert(r.getBoolean(5) == r.getDouble(4) > r.getDouble(3) ||
        math.abs(r.getDouble(4) - r.getDouble(3)) < 1e-9)
    }
  }

  test("abandonment: views conserve; converted never exceeds views") {
    val a = graft.operators.EventOps.abandonment(spark, TestSpark.Sf0001)
      .collect()
    val nViews = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("event_type") === "view").count()
    assert(a.map(_.getLong(1)).sum == nViews)
    a.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // window=0 converts nothing (strictly-later purchase, gap > 0)
    val zero = graft.operators.EventOps
      .abandonment(spark, TestSpark.Sf0001, 0L).collect()
    assert(zero.map(_.getLong(2)).sum <= a.map(_.getLong(2)).sum)
  }

  test("peak concurrency is positive and bounded by the session count") {
    val p = graft.operators.EventOps.peakConcurrency(spark, TestSpark.Sf0001)
      .head()
    assert(p.getLong(1) >= 1L && p.getLong(1) <= p.getLong(0))
  }

  test("double-charge audit: planted resubmissions all surface") {
    val d = graft.operators.Analytics.doubleCharge(spark, TestSpark.Sf0001)
      .collect()
    val planted = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .filter(pmod(col("o_orderkey"), lit(97)) === 0).count()
    // every planted resubmission creates (or joins) a duplicate group
    assert(d.map(_.getLong(3) - 1).sum >= planted)
    d.foreach(r => assert(r.getLong(3) >= 2))
  }

  test("recs: <=3 per source, confidence in (0,1], symmetric support") {
    val r = graft.operators.Analytics
      .itemRecommendations(spark, TestSpark.Sf0001).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
      // within a source, ranks follow support descending
      val bySupport = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(bySupport.zip(bySupport.tail).forall { case (a, b) => a >= b })
    }
    r.foreach { row =>
      assert(row.getDouble(4) > 0.0 && row.getDouble(4) <= 1.0)
      assert(row.getDouble(5) > 0.0)
    }
  }

  test("brand margin: net = gross - disc, rates in (0,1), lines conserve") {
    val m = graft.operators.Analytics.brandMargin(spark, TestSpark.Sf0001)
      .collect()
    val nLi = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001).count()
    assert(m.map(_.getLong(1)).sum == nLi)
    m.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 1.0)
    }
  }

  test("single-source risk: buckets partition the part space") {
    val s = graft.operators.Analytics.singleSourceRisk(spark, TestSpark.Sf0001)
      .collect()
    val nParts = graft.sources.Tables.lineitem(spark, TestSpark.Sf0001)
      .select("l_partkey").distinct().count()
    assert(s.map(_.getLong(1)).sum == nParts)
    assert(math.abs(s.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    s.foreach(r => assert(r.getBoolean(3) == (r.getLong(0) == 1L)))
  }

  test("quant error: bounded by half a quantization step per value") {
    val q = graft.scale.EmbedStats.quantErrorQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(q.length == 64)
    q.foreach { r =>
      val (scale, maxErr) = (r.getDouble(2), r.getDouble(3))
      assert(maxErr >= 0.0)
      // in-range values quantize to within scale/2 (+ float slack)
      assert(maxErr <= scale / 2 + 1e-12, s"dim ${r.getLong(0)}")
      assert(r.getLong(4) >= 0L)
    }
  }

  test("mann-whitney: U bounds, symmetry with swapped samples, delta in [-1,1]") {
    val r = graft.operators.Distribution.mannWhitney(spark, TestSpark.Sf0001)
      .head()
    val (na, nb, u2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(u2 >= 0L && u2 <= 2L * na * nb)
    assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
    // U_A + U_B = nA*nB  (computed by swapping the sample roles)
    val sw = graft.operators.Distribution
      .mannWhitney(spark, TestSpark.Sf0001, "MACHINERY", "BUILDING").head()
    assert(u2 + sw.getLong(2) == 2L * na * nb)
    assert(math.abs(r.getDouble(5) + sw.getDouble(5)) < 1e-9) // z antisymmetric
  }

  test("dim variance: positive, rel <= 1, one shared anisotropy ratio >= 1") {
    val v = graft.scale.EmbedStats.dimVarianceQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(v.length == 64)
    val aniso = v.map(_.getDouble(5)).distinct
    assert(aniso.length == 1 && aniso.head >= 1.0)
    v.foreach { r =>
      assert(r.getDouble(3) > 0.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("spearman: rho in [-1,1]; rank-of-self correlation is exactly 1") {
    val r = graft.operators.Distribution.spearman(spark, TestSpark.Sf0001)
      .head()
    assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    assert(r.getLong(1) >= 0L)
    // sanity: sum_d2 = 0 iff the two rankings coincide — they don't here
    assert(r.getLong(1) > 0L)
    // closed-form check on a tiny frame: perfectly reversed ranks → rho = -1
    import spark.implicits._
    val n = 5L
    val d2 = (1L to n).map(i => (i - (n + 1 - i)) * (i - (n + 1 - i))).sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1))
    assert(rho == -1.0)
  }

  test("benford gof: 9-digit spine, probabilities sum to 1, counts conserve") {
    val g = graft.operators.Analytics.benfordGof(spark, TestSpark.Sf0001)
      .collect()
    assert(g.map(_.getString(0)).toSeq == (1 to 9).map(_.toString))
    assert(math.abs(g.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    val direct = graft.operators.Analytics
      .benfordDigits(spark, TestSpark.Sf0001).collect().map(_.getLong(1)).sum
    assert(g.map(_.getLong(1)).sum == direct)
    g.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("srm: arms partition the purchasing users; chi2 nonnegative") {
    val r = graft.operators.EventOps.sampleRatioMismatch(spark, TestSpark.Sf0001)
      .head()
    val users = graft.sources.Tables.events(spark, TestSpark.Sf0001)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users)
    assert(r.getDouble(3) >= 0.0)
    assert(r.getBoolean(4) == (r.getDouble(3) > 3.841))
  }

  test("prop test: pooled rate between the arms; z antisymmetric under swap") {
    val r = graft.operators.Distribution
      .twoProportionTest(spark, TestSpark.Sf0001).head()
    val (pa, pb, pool) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(pool >= math.min(pa, pb) && pool <= math.max(pa, pb))
    val sw = graft.operators.Distribution
      .twoProportionTest(spark, TestSpark.Sf0001, "MACHINERY", "BUILDING")
      .head()
    assert(math.abs(r.getDouble(7) + sw.getDouble(7)) < 1e-12)
  }

  test("anova: eta-squared in [0,1), F nonnegative, n conserves orders") {
    val r = graft.operators.Distribution.anovaWeekday(spark, TestSpark.Sf0001)
      .head()
    assert(r.getLong(0) ==
      graft.sources.Tables.orders(spark, TestSpark.Sf0001).count())
    val eta = r.getDouble(1)
    assert(eta >= 0.0 && eta < 1.0)
    assert(r.getDouble(2) >= 0.0)
  }

  test("winsorized mean: inside the clamp band, pulled toward the center") {
    val r = graft.operators.Distribution.winsorizedMean(spark, TestSpark.Sf0001)
      .collect()
    assert(r.length == 5)
    r.foreach { row =>
      val (lo, hi) = (row.getLong(2), row.getLong(3))
      val (raw, wins) = (row.getDouble(4), row.getDouble(5))
      assert(lo <= hi)
      assert(wins >= lo.toDouble && wins <= hi.toDouble)
      // clamping can only move mass toward the band
      assert(math.abs(wins - (lo + hi) / 2.0) <=
        math.abs(raw - (lo + hi) / 2.0) + math.abs(raw - wins) + 1e-9)
    }
  }

  test("segment ginis: in [0,1), customers conserve vs the global query") {
    val g = graft.operators.Analytics.giniBySegment(spark, TestSpark.Sf0001)
      .collect()
    assert(g.length == 5)
    g.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0))
    val globalN = graft.operators.Analytics.spendGini(spark, TestSpark.Sf0001)
      .head().getLong(0)
    assert(g.map(_.getLong(1)).sum == globalN)
  }

  test("welch t: arms conserve orders, t antisymmetric under arm swap, df bounded") {
    val w = graft.operators.Distribution.welchTTest(spark, TestSpark.Sf0001).head()
    val nA = w.getLong(0); val nB = w.getLong(1)
    val expected = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .join(graft.sources.Tables.customer(spark, TestSpark.Sf0001),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .count()
    assert(nA + nB == expected)
    val t = w.getDouble(4); val dfW = w.getDouble(5); val d = w.getDouble(6)
    assert(math.signum(t) == math.signum(d)) // same numerator sign
    assert(dfW >= math.min(nA, nB) - 1.0 && dfW <= nA + nB - 2.0)
    val swapped = graft.operators.Distribution
      .welchTTest(spark, TestSpark.Sf0001, "MACHINERY", "BUILDING").head()
    assert(math.abs(swapped.getDouble(4) + t) < 1e-12)
  }

  test("kendall tau-b: pair classes partition the nation pairs, tau in [-1,1]") {
    val k = graft.operators.Distribution.kendallTau(spark, TestSpark.Sf0001).head()
    val (np, c, dis, tx, ty) =
      (k.getLong(0), k.getLong(1), k.getLong(2), k.getLong(3), k.getLong(4))
    assert(c + dis <= np && tx <= np && ty <= np)
    assert(c + dis + math.max(tx, ty) >= np - math.min(tx, ty)) // classes cover
    val tau = k.getDouble(5)
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("grubbs: five segments, positive sd, G consistent with max_dev/sd") {
    val g = graft.operators.Distribution.grubbsTest(spark, TestSpark.Sf0001).collect()
    assert(g.length == 5)
    g.foreach { r =>
      assert(r.getDouble(3) > 0.0) // sd
      assert(r.getDouble(4) >= 0.0) // max_dev
      assert(math.abs(r.getDouble(5) - r.getDouble(4) / r.getDouble(3)) < 1e-9)
    }
  }

  test("corr matrix: three finite pairs in [-1,1], self-consistent with groupedOls") {
    val m = graft.operators.Regression.corrMatrix(spark, TestSpark.Sf0001).collect()
    assert(m.length == 3)
    m.foreach(r => assert(!r.getDouble(3).isNaN &&
      r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0))
    // the (quantity, extendedprice) cell must equal the groupedOls corr
    // over the same scaled inputs — one shared exact-moment discipline
    val viaOls = graft.operators.Regression.groupedOls(
      graft.sources.Tables.lineitem(spark, TestSpark.Sf0001)
        .select(lit(1).as("g"), col("l_quantity").cast("long").as("x"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("y")),
      Seq("g"), col("x"), col("y")).head().getDouble(4)
    val qp = m.find(r => r.getString(0) == "quantity" &&
      r.getString(1) == "extendedprice").get.getDouble(3)
    assert(math.abs(qp - viaOls) < 1e-12)
  }

  test("balanced shards: docs conserve and loads stay near the even split") {
    val s = graft.scale.TrainingData.balancedShards(spark, TestSpark.Sf0001).collect()
    assert(s.length == 8)
    val total = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(s.map(_.getLong(1)).sum == total)
    s.foreach { r =>
      val ratio = r.getDouble(5)
      assert(ratio > 0.8 && ratio < 1.2, s"shard ${r.getLong(0)} ratio $ratio")
    }
  }

  test("attribution: last-touch wins conserve touched purchases; credits bounded") {
    val a = graft.operators.EventOps.attribution(spark, TestSpark.Sf0001).collect()
    assert(a.nonEmpty && a.map(_.getString(0)).toSet.subsetOf(Set("click", "view")))
    val lastWins = a.map(_.getLong(4)).sum
    val touchedPurchases = a.map(_.getLong(2)).max // ≥ distinct pids per type
    assert(lastWins >= touchedPurchases) // every touched purchase has ONE last touch
    // linear credits never exceed 1e6 per touched purchase overall
    assert(a.map(_.getLong(3)).sum <= lastWins * 1000000L)
  }

  test("sax: 16 segments partition the days; symbols drawn from the 4-letter alphabet") {
    val s = graft.operators.TimeSeries.saxSymbols(spark, TestSpark.Sf0001).collect()
    assert(s.length == 16)
    assert(s.map(_.getLong(0)).toSeq == (0L until 16L))
    val nDays = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .select(expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
      .distinct().count()
    assert(s.map(_.getLong(1)).sum == nDays)
    s.foreach { r =>
      assert(Set("a", "b", "c", "d").contains(r.getString(5)))
      // symbol agrees with the z bucket it claims
      val z = r.getDouble(4)
      val sym = if (z < -0.6745) "a" else if (z < 0.0) "b"
        else if (z < 0.6745) "c" else "d"
      assert(r.getString(5) == sym)
    }
  }

  test("basket3: triples are ordered, supported, and bounded by pair support") {
    val t = graft.operators.Analytics.tripleItemsets(spark, TestSpark.Sf0001).collect()
    assert(t.length <= 20)
    t.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(1) < r.getLong(2))
      assert(r.getLong(3) >= 2L)
    }
    // anti-monotonicity: a triple's support never exceeds any pair's
    val pairSupport = graft.operators.Analytics
      .basketLift(spark, TestSpark.Sf0001, minCnt = 1L, k = 1000000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    t.foreach { r =>
      val c = r.getLong(3)
      pairSupport.get((r.getLong(0), r.getLong(1))).foreach(p => assert(c <= p))
      pairSupport.get((r.getLong(1), r.getLong(2))).foreach(p => assert(c <= p))
    }
  }

  test("fertility: docs conserve per language; ratios positive and consistent") {
    val f = graft.scale.TextAnalysis.fertilityByLang(spark, TestSpark.Sf0001).collect()
    val total = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(f.map(_.getLong(1)).sum == total)
    f.foreach { r =>
      assert(r.getDouble(5) > 0.0 && r.getDouble(6) > 0.0)
      // tokens_per_word · chars_per_token = chars/words (ratio identity)
      val lhs = r.getDouble(5) * r.getDouble(6)
      val rhs = r.getLong(4).toDouble / r.getLong(2).toDouble
      assert(math.abs(lhs - rhs) < 1e-9)
    }
  }

  test("auc: in [0,1] and consistent with the U identity") {
    val a = graft.ml.Eval.aucQuery(spark, TestSpark.Sf0001).head()
    val (nPos, nNeg, u2) = (a.getLong(0), a.getLong(1), a.getLong(2))
    assert(nPos > 0 && nNeg > 0)
    val auc = a.getDouble(3)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(auc - u2.toDouble / (2.0 * nPos * nNeg)) < 1e-12)
  }

  test("calibration: deciles partition orders; gain monotone to 1.0; lift consistent") {
    val c = graft.ml.Eval.calibrationQuery(spark, TestSpark.Sf0001).collect()
    assert(c.length == 10)
    val totalOrders = graft.sources.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(c.map(_.getLong(1)).sum == totalOrders)
    val gains = c.map(_.getDouble(5))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(math.abs(gains.last - 1.0) < 1e-12)
    val totPos = c.map(_.getLong(2)).sum.toDouble
    c.foreach { r =>
      val expLift = r.getDouble(3) / (totPos / totalOrders)
      assert(math.abs(r.getDouble(4) - expLift) < 1e-9)
    }
  }

  test("decompose: weekday rows carry the exact scaled-residual identity") {
    val d = graft.operators.TimeSeries
      .weekdayDecomposition(spark, TestSpark.Sf0001).collect()
    assert(d.nonEmpty && d.map(_.getLong(0)).forall(w => w >= 0 && w <= 6))
    d.foreach { r =>
      val expected = r.getLong(2).toDouble / (r.getLong(1) * 7).toDouble
      assert(math.abs(r.getDouble(3) - expected) < 1e-12)
    }
    // residuals of a 7-day MA sum to ~0 over whole weeks: the weekday
    // means must not all share one sign
    val signs = d.map(r => math.signum(r.getDouble(3))).toSet
    assert(signs.size > 1 || signs.contains(0.0))
  }

  test("cms: estimates are one-sided (est >= true) for every reported part") {
    val c = graft.operators.Approx.countMinSketch(spark, TestSpark.Sf0001).collect()
    assert(c.length == 20)
    c.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // est >= true
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  test("hll: 64 registers, estimate lands within the sketch's error regime") {
    val h = graft.operators.Approx.hllEstimate(spark, TestSpark.Sf0001).head()
    assert(h.getLong(0) == 64L)
    assert(h.getLong(1) > 0 && h.getLong(1) <= 64L)
    val relErr = h.getDouble(5)
    // m=64 → rsd ≈ 1.04/√64 = 13%; allow 4 sigma
    assert(math.abs(relErr) < 0.52, s"rel_err $relErr")
  }

  test("lorenz: shares monotone, convex below the diagonal, ending at 1.0") {
    val l = graft.operators.Analytics.lorenzCurve(spark, TestSpark.Sf0001).collect()
    assert(l.length == 10)
    val shares = l.map(_.getDouble(4))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(math.abs(shares.last - 1.0) < 1e-12)
    // ascending-order deciles ⇒ curve under the diagonal
    l.foreach(r => assert(r.getDouble(4) <= r.getDouble(5) + 1e-9))
  }

  test("hazard: risk sets telescope by exits; all customers enter at week 0") {
    val h = graft.operators.TimeSeries.reorderHazard(spark, TestSpark.Sf0001)
      .collect()
    val nCust = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(h.head.getLong(0) == 0L || h.head.getLong(1) == nCust)
    assert(h.map(r => r.getLong(2) + r.getLong(3)).sum == nCust)
    // at_risk(w+1) = at_risk(w) − events(w) − censored(w) on the week spine
    h.sliding(2).foreach {
      case Array(a, b) if b.getLong(0) == a.getLong(0) + 1 =>
        assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3))
      case _ => // non-contiguous weeks: no telescoping claim
    }
    h.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("backtest: per-priority MAE bounds the signed bias") {
    val b = graft.operators.TimeSeries
      .seasonalNaiveBacktest(spark, TestSpark.Sf0001).collect()
    assert(b.nonEmpty)
    b.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(math.abs(r.getLong(3)) <= r.getLong(2)) // |bias| <= abs err
      assert(math.abs(r.getDouble(4) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-9)
    }
  }

  test("kmv: full sketch, kth hash in (0,1], estimate in the error regime") {
    val r = graft.operators.Approx.kmvEstimate(spark, TestSpark.Sf0001).head()
    assert(r.getLong(0) == 64L)
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) <= 1.0)
    // k=64 → rsd ≈ 1/√62 ≈ 12.7%; allow 4 sigma
    assert(math.abs(r.getDouble(4)) < 0.51, s"rel_err ${r.getDouble(4)}")
  }

  test("bootstrap: 32 resamples, weights near Poisson(1) mass, means bracket truth") {
    val b = graft.operators.Distribution.poissonBootstrap(spark, TestSpark.Sf0001)
      .collect()
    assert(b.length == 32)
    val n = graft.sources.Tables.orders(spark, TestSpark.Sf0001).count()
    // E[n_eff] = n per resample (Poisson(1) truncated at 4: mass ≈ 0.996)
    b.foreach(r => assert(math.abs(r.getLong(1) - n) < n * 0.25))
    val means = b.map(_.getDouble(3))
    val truth = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .agg(avg((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")))
      .head().getDouble(0)
    // the resample spread brackets the plain mean
    assert(means.min <= truth && truth <= means.max)
  }

  test("price index: laspeyres/paasche positive, fisher is their geometric mean") {
    val r = graft.operators.Analytics.priceIndices(spark, TestSpark.Sf0001).head()
    assert(r.getLong(0) > 0)
    val (l, p, f) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(l > 0.0 && p > 0.0)
    assert(math.abs(f - math.sqrt(l * p)) < 1e-12)
    // both indices near 1 on a stationary synthetic corpus
    assert(l > 0.5 && l < 2.0 && p > 0.5 && p < 2.0)
  }

  test("pca power: normalized iterate is a near-fixed-point of the scatter matrix") {
    val rows = graft.scale.EmbedStats.pcaPowerQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.length == 64)
    val x = rows.map(r => (r.getLong(0).toInt, r.getLong(1).toDouble)).toMap
    assert(x.values.map(math.abs).max == 10000.0) // renormalization invariant
    assert(rows.head.getDouble(2) > 0.0) // top eigenvalue of the scatter > 0
    // rebuild the exact scatter matrix locally and check cos(x, Ax) ≈ 1
    val vecs = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(v => math.floor((v + 1) * 10000).toLong).toArray)
    val d = 64; val n = vecs.length.toDouble
    val s = Array.ofDim[Double](d, d); val m = new Array[Double](d)
    vecs.foreach { q =>
      var j = 0
      while (j < d) {
        m(j) += q(j)
        var k = 0
        while (k < d) { s(j)(k) += q(j).toDouble * q(k); k += 1 }
        j += 1
      }
    }
    val ax = new Array[Double](d)
    for (j <- 0 until d; k <- 0 until d)
      ax(j) += (n * s(j)(k) - m(j) * m(k)) * x(k + 1)
    val dot = (0 until d).map(j => ax(j) * x(j + 1)).sum
    val na = math.sqrt(ax.map(v => v * v).sum)
    val nx = math.sqrt((1 to d).map(j => x(j) * x(j)).sum)
    // the 10⁴ renormalization grid floors the attainable alignment at
    // ~1e-3 angle error (each component carries ±0.5e-4 quantization);
    // 0.995 is well above chance (≈0.12 for a random 64-dim direction)
    // and just under the observed 0.9986 fixed point
    assert(dot / (na * nx) > 0.995, s"cos=${dot / (na * nx)}")
  }

  test("modularity: Q in [-0.5, 1], contributions sum to Q, edges conserve") {
    val m = graft.operators.Triangles.modularityQuery(spark, TestSpark.Sf0001)
      .collect()
    assert(m.nonEmpty)
    val q = m.head.getDouble(5)
    assert(q >= -0.5 && q <= 1.0)
    assert(math.abs(m.map(_.getDouble(4)).sum - q) < 1e-9)
    // Σ a_c = 2m (every edge endpoint counted once in some community)
    val degSum = m.map(_.getLong(3)).sum
    assert(degSum % 2 == 0)
    assert(m.map(_.getLong(2)).sum <= degSum / 2) // internal ≤ total edges
  }

  test("f1: per-label identity 2tp/(2tp+fp+fn); fn+tp conserves docs") {
    val f = graft.scale.TextAnalysis.f1Report(spark, TestSpark.Sf0001).collect()
    val total = graft.sources.Tables.documents(spark, TestSpark.Sf0001).count()
    assert(f.map(r => r.getLong(1) + r.getLong(3)).sum == total)
    f.foreach { r =>
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val f1 = r.getDouble(6)
      assert(math.abs(f1 - 2.0 * tp / (2.0 * tp + fp + fn)) < 1e-12)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("polyfit: coefficients reproduce the exact normal equations") {
    val r = graft.operators.Regression.polyfitQuery(spark, TestSpark.Sf0001).head()
    val (a, b, c) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // rebuild the moments locally and check the three normal equations
    val daily = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .select(expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")
        .as("day"), col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg((sum(col("p")) * 100).cast("long").as("y"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val dmin = daily.map(_._1).min
    val xs = daily.map { case (d, y) => ((d - dmin).toDouble, y.toDouble) }
    def mom(px: Int, withY: Boolean) =
      xs.map { case (x, y) => math.pow(x, px) * (if (withY) y else 1.0) }.sum
    val (s0, s1, s2, s3, s4) =
      (mom(0, false), mom(1, false), mom(2, false), mom(3, false), mom(4, false))
    val (t0, t1, t2) = (mom(0, true), mom(1, true), mom(2, true))
    assert(math.abs(c * s0 + b * s1 + a * s2 - t0) / math.abs(t0) < 1e-6)
    assert(math.abs(c * s1 + b * s2 + a * s3 - t1) / math.abs(t1) < 1e-6)
    assert(math.abs(c * s2 + b * s3 + a * s4 - t2) / math.abs(t2) < 1e-6)
  }

  test("theil-sen: median slope is bracketed by the slope extremes; pair count checks") {
    val r = graft.operators.Regression.theilSenQuery(spark, TestSpark.Sf0001).head()
    val (nDays, nPairs) = (r.getLong(0), r.getLong(1))
    assert(nPairs == nDays * (nDays - 1) / 2)
    val s = r.getDouble(2)
    // a robust slope of a stationary synthetic series is near zero
    // relative to the daily magnitudes
    val meanY = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .agg(avg((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")))
      .head().getDouble(0)
    assert(math.abs(s) < meanY) // slope/day far below one order's value
  }

  test("wasserstein: nonnegative, zero on a self-comparison, above the mean gap") {
    val r = graft.operators.Distribution
      .wassersteinDistance(spark, TestSpark.Sf0001).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val emd = r.getDouble(2)
    assert(emd >= 0.0)
    val self = graft.operators.Distribution
      .wassersteinDistance(spark, TestSpark.Sf0001, "BUILDING", "BUILDING")
      .head().getDouble(2)
    assert(self == 0.0)
    // EMD dominates the mean difference (Jensen)
    val m = graft.operators.Distribution.welchTTest(spark, TestSpark.Sf0001).head()
    val meanGap = math.abs(m.getDouble(2) - m.getDouble(3)) * 100 // dollars→cents
    assert(emd >= meanGap - 1e-6, s"emd=$emd meanGap=$meanGap")
  }

  test("stationary: five states, mass conserved to the 1e6 grid, matches visit rates") {
    val s = graft.operators.EventOps.stationaryDistribution(spark, TestSpark.Sf0001)
      .collect()
    assert(s.length == 5)
    val total = s.map(_.getLong(1)).sum
    assert(total > 990000L && total <= 1000000L) // div truncation loses < |types|·rounds
    s.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // the chain is built from near-uniform synthetic transitions: the
    // stationary mass should not collapse onto one state
    assert(s.map(_.getDouble(2)).max < 0.5)
  }

  test("did: cells conserve orders; estimate matches the four-mean identity") {
    val r = graft.operators.Distribution.diffInDiff(spark, TestSpark.Sf0001).head()
    val cellsTotal = (0 to 3).map(r.getLong).sum
    val expected = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .join(graft.sources.Tables.customer(spark, TestSpark.Sf0001),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")).count()
    assert(cellsTotal == expected)
    val did = (r.getDouble(5) - r.getDouble(4)) - (r.getDouble(7) - r.getDouble(6))
    assert(math.abs(r.getDouble(8) - did) < 1e-9)
  }

  test("pca projection: labels conserve vectors; variances positive") {
    val p = graft.scale.EmbedStats.pcaProjectionQuery(spark, TestSpark.Sf0001)
      .collect()
    val total = graft.sources.Tables.embeddings(spark, TestSpark.Sf0001).count()
    assert(p.map(_.getLong(1)).sum == total)
    p.foreach { r =>
      assert(!r.getDouble(2).isNaN)
      assert(r.getDouble(3) > 0.0) // non-degenerate projections per label
    }
  }

  test("ipf: fitted margins converge to the uniform target") {
    val w = graft.operators.Distribution.ipfRaking(spark, TestSpark.Sf0001)
      .collect()
    assert(w.length == 25)
    val total = w.map(_.getLong(2)).sum.toDouble
    val target = total / 5.0
    val rowSums = w.groupBy(_.getString(0)).values.map(_.map(_.getDouble(4)).sum)
    val colSums = w.groupBy(_.getString(1)).values.map(_.map(_.getDouble(4)).sum)
    // after 6 rounds both margins sit within 0.1% of the target
    rowSums.foreach(s => assert(math.abs(s - target) / target < 1e-3, s"row $s vs $target"))
    colSums.foreach(s => assert(math.abs(s - target) / target < 1e-3, s"col $s vs $target"))
    w.foreach(r => assert(r.getLong(3) >= 0L))
  }

  test("log2 histogram: buckets partition the rows and quantile flags are unique") {
    val h = graft.operators.Approx.log2Histogram(spark, TestSpark.Sf0001).collect()
    val total = h.map(_.getLong(1)).sum
    assert(h.last.getLong(2) == total) // cum of last bucket = total
    for (i <- Seq(4, 5, 6)) // is_p50/is_p90/is_p99 columns
      assert(h.count(_.getBoolean(i)) == 1)
  }
}
