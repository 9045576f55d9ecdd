package graft

import org.apache.spark.sql.functions._

import graft.scale.{Dedup, Similarity, TextAnalysis}

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: 3-grams, distinct, short-doc guard") {
    val r = evalExpr(
      Dedup.shingles(split(lit("a b c d"), " ")),
      Dedup.shingles(split(lit("a b"), " ")))
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("exactDupGroups finds duplicated fingerprints only") {
    val docs = Seq((1L, "x y z"), (2L, "x  Y z"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDupGroups(docs, TextAnalysis.fingerprint(col("text"))).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L && out.head.getLong(2) == 1L)
  }

  test("jaccardPairs finds the planted near-dups at sf0.001") {
    val out = Dedup.jaccardPairs(spark, TestSpark.Sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(3) >= 0.5))
  }

  test("minhashPairs candidates agree with jaccard near-dups") {
    val mh = Dedup.minhashPairs(spark, TestSpark.Sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jc = Dedup.jaccardPairs(spark, TestSpark.Sf0001, threshold = 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jc.subsetOf(mh), s"high-jaccard pairs $jc missing from minhash candidates $mh")
  }

  test("cosine: identical=1, orthogonal=0") {
    val r = evalExpr(
      Similarity.cosine(array(lit(1.0), lit(2.0)), array(lit(1.0), lit(2.0))),
      Similarity.cosine(array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0))))
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("knnBruteForce returns k ordered neighbors, excludes query") {
    val out = Similarity.knnBruteForce(spark, TestSpark.Sf0001, queryId = 0L, k = 5).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(0) != 0L))
    val sims = out.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("knnLshBucketed scores agree with brute force on shared candidates") {
    val brute = Similarity.knnBruteForce(spark, TestSpark.Sf0001, queryId = 0L, k = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lsh = Similarity.knnLshBucketed(spark, TestSpark.Sf0001, queryId = 0L, k = 10)
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      assert(math.abs(brute(r.getLong(0)) - r.getDouble(2)) < 1e-9)
    }
  }

  test("simhash: identical tokens -> hamming 0; pairs find planted near-dups") {
    val r = evalExpr(
      Dedup.simhash(split(lit("a b c d e f"), " ")),
      Dedup.simhash(split(lit("a b c d e f"), " ")))
    assert(r.getLong(0) == r.getLong(1))
    // codegen expression over raw text ≡ UDF over split tokens, for every
    // corpus doc plus edge shapes (empty text, repeated/trailing spaces)
    val edge = Seq((9001L, ""), (9002L, "a  b "), (9003L, " x"))
      .toDF("doc_id", "text")
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").unionByName(edge)
    val diff = docs.select(
        Dedup.simhashText(col("text")).as("e"),
        Dedup.simhash(split(col("text"), " ")).as("u"))
      .filter(col("e") =!= col("u")).count()
    assert(diff == 0L, "expression and UDF signatures must be bit-identical")
    val pairs = Dedup.simhashPairs(spark, TestSpark.Sf0001, maxHamming = 10).collect()
    assert(pairs.nonEmpty)
    val jc = Dedup.jaccardPairs(spark, TestSpark.Sf0001, threshold = 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jc.subsetOf(sh), s"jaccard>=0.9 pairs $jc not all within hamming 10: $sh")
  }

  test("jaccardPairs: hot-shingle cap drops boilerplate-only pairs, keeps real near-dups") {
    import spark.implicits._
    // 30 docs sharing ONLY a viral boilerplate phrase + 2 genuine near-dups.
    val boiler = "subscribe to our newsletter for updates today"
    val docs = ((1 to 30).map(i => (i.toLong, s"$boiler unique$i token$i filler$i", "en")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta eta", "en"),
          (101L, "alpha beta gamma delta epsilon zeta theta", "en")))
      .toDF("doc_id", "text", "lang")
    val capped = Dedup.jaccardPairsFrom(docs, threshold = 0.2, maxDf = 10).collect()
    val pairs = capped.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)), "real near-dup must survive the cap")
    assert(pairs.forall { case (a, b) => a >= 100L && b >= 100L },
      s"boilerplate-only pairs must be dropped by the df cap: $pairs")
    // without the cap the 30 boilerplate docs generate O(30²) candidates
    val uncapped = Dedup.jaccardPairsFrom(docs, threshold = 0.2, maxDf = 1000)
      .count()
    assert(uncapped > capped.length, "cap must reduce the candidate pair count")
  }

  test("Silver: persisted-table path produces identical results to localCheckpoint") {
    val local = Dedup.minhashPairs(spark, TestSpark.Sf0001).collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_silver").toString
    spark.conf.set("spark.graft.silver.dir", dir)
    try {
      val persisted = Dedup.minhashPairs(spark, TestSpark.Sf0001).collect().toSeq
      assert(persisted == local)
      val silverTables = new java.io.File(dir).listFiles().map(_.getName).toSet
      // signatures build as a zero-exchange projection now, so the only
      // silver table this path persists is the signature frame itself
      assert(silverTables.contains("minhash_sig"),
        s"expected silver tables under $dir, found $silverTables")
    } finally spark.conf.unset("spark.graft.silver.dir")
  }

  test("simhash: fast UDF and relational-expression variant agree bit-for-bit") {
    // deterministic subset, not limit(): the two variants run as
    // INDEPENDENT executions, and limit over the fanned (shuffled)
    // documents scan may pick different rows per execution
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .filter(col("doc_id") < 50)
    val fast = docs
      .select(col("doc_id"), Dedup.simhash(split(col("text"), " ")).as("sig"))
    val rel = Dedup.simhashRelational(docs)
      .withColumnRenamed("sig", "sig_rel")
    val joined = fast.join(rel, "doc_id").collect()
    assert(joined.length == 50)
    joined.foreach { r =>
      assert(r.getAs[Long]("sig") == r.getAs[Long]("sig_rel"),
        s"doc ${r.getAs[Long]("doc_id")}: UDF and relational simhash differ")
    }
  }

  test("cosineNearDupPairs: planted perturbed copies found, disjoint vectors not") {
    val out = Similarity.cosineDupRoundTrip(spark, TestSpark.Sf0001).collect()
    assert(out.nonEmpty)
    // every pair is a (vec, vec+1000000) planted copy with cosine ≈ 1
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 1000000L,
        s"unexpected non-planted pair: ${r.getLong(0)}, ${r.getLong(1)}")
      assert(r.getDouble(2) > 0.99)
    }
    // candidate generation is banded: the join key is (band, bkey), so the
    // plan must contain a hash join on the band key, not a cartesian
    val plan = Similarity.cosineDupRoundTrip(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("rollingFingerprint: deterministic, edit-robust overlap") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val edited = base.replace("jumps", "leaps")
    val r = evalExpr(
      TextAnalysis.rollingFingerprint(lit(base)),
      TextAnalysis.rollingFingerprint(lit(base)),
      TextAnalysis.sketchOverlap(
        TextAnalysis.rollingFingerprint(lit(base)),
        TextAnalysis.rollingFingerprint(lit(edited))),
      TextAnalysis.sketchOverlap(
        TextAnalysis.rollingFingerprint(lit(base)),
        TextAnalysis.rollingFingerprint(lit("completely different content here entirely unrelated"))))
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getDouble(2) > 0.3, s"edit overlap ${r.getDouble(2)}")
    assert(r.getDouble(3) < 0.2, s"unrelated overlap ${r.getDouble(3)}")
  }

  test("winnowFingerprints: coverage guarantee, short-doc empty, disjoint texts disjoint") {
    import TextAnalysis.{WinnowK, WinnowW}
    // Winnowing's guarantee: a shared token run of length >= k+w-1 yields
    // >= 1 shared fingerprint, whatever surrounds it in either document.
    val run = (1 to (WinnowK + WinnowW - 1)).map(i => s"run$i").mkString(" ")
    val inA = s"alpha beta gamma delta $run omega"
    val inB = s"$run zeta eta theta iota kappa lambda"
    val r = evalExpr(
      size(array_intersect(
        TextAnalysis.winnowFingerprints(lit(inA)),
        TextAnalysis.winnowFingerprints(lit(inB)))),
      TextAnalysis.winnowFingerprints(lit("too short to winnow at all")),
      size(array_intersect(
        TextAnalysis.winnowFingerprints(lit(inA)),
        TextAnalysis.winnowFingerprints(
          lit("wholly unrelated words with zero overlap whatsoever in any position of this text")))))
    assert(r.getInt(0) >= 1, "coverage guarantee violated for a k+w-1 shared run")
    assert(r.getSeq[String](1).isEmpty, "sub-window doc must have no fingerprints")
    assert(r.getInt(2) == 0, "disjoint texts must share no fingerprints")
  }

  test("winnowPairsQuery: planted mutations detected, organic pairs real, join not cartesian") {
    val out = TextAnalysis.winnowPairsQuery(spark, TestSpark.Sf0001).collect()
    out.foreach(r => assert(r.getLong(2) >= TextAnalysis.WinnowMinShared))
    // Most planted mutations are detected: the ~1/16 type-drop leaves
    // long identical runs, so the coverage guarantee fires.
    val plantedFound = out.count(r => r.getLong(1) == r.getLong(0) + 30000000L)
    val planted = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .filter(pmod(col("doc_id"), lit(20)) === 0).count()
    assert(plantedFound >= (planted * 8) / 10,
      s"only $plantedFound of $planted planted pairs detected")
    // The corpus also carries ORGANIC near-dups (the same ones
    // q_exact_dups / the jaccard family find). Any non-planted pair must
    // be a true detection: verify each shares >= 1 literal 6-token gram
    // (the winnowing fingerprint preimage) by direct recomputation.
    val organic = out.filter(r => r.getLong(1) != r.getLong(0) + 30000000L)
    if (organic.nonEmpty) {
      import TextAnalysis.WinnowK
      val grams = TextAnalysis.winnowCorpus(spark, TestSpark.Sf0001)
        .select(col("doc_id"), transform(
          sequence(lit(1), size(split(col("text"), " ")) - (WinnowK - 1)),
          i => concat_ws(" ", slice(split(col("text"), " "), i, lit(WinnowK)))).as("gs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      organic.foreach { r =>
        val (d1, d2) = (r.getLong(0), r.getLong(1))
        assert(grams(d1).intersect(grams(d2)).nonEmpty,
          s"organic pair ($d1, $d2) shares no literal $WinnowK-gram — false positive")
      }
    }
    val plan = TextAnalysis.winnowPairsQuery(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("knnBatch: per-query ranked neighbors, consistent with single-query") {
    val batch = Similarity.knnBatch(spark, TestSpark.Sf0001, Seq(0L, 1L), k = 5)
      .collect()
    assert(batch.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L))
    val single = Similarity.knnBruteForce(spark, TestSpark.Sf0001, queryId = 0L, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val fromBatch = batch.filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(single == fromBatch)
  }

  test("IVF ANN: probed search recalls most of brute-force top-k") {
    val index = Similarity.ivfBuild(spark, TestSpark.Sf0001, k = 8)
    assert(index.assigned.select("cell").distinct().count() <= 8)
    val qv = index.assigned.filter(col("vec_id") === 0L)
      .select("v").head().getSeq[Double](0).toArray
    val ivf = Similarity.ivfSearch(index, qv, k = 10, nProbe = 4)
      .filter(col("vec_id") =!= 0L).collect().map(_.getLong(0)).toSet
    val brute = Similarity.knnBruteForce(spark, TestSpark.Sf0001, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low (ivf=$ivf brute=$brute)")
  }

  test("PQ ANN: m-id codes, ADC + re-rank recalls brute-force top-k") {
    val index = Similarity.pqBuild(spark, TestSpark.Sf0001, m = 8, k = 16)
    // codes are m small ids — the 32x memory compression claim
    val code = index.assigned.select("code").head().getSeq[Int](0)
    assert(code.length == 8 && code.forall(c => c >= 0 && c < 16))
    val qv = index.assigned.filter(col("vec_id") === 0L)
      .select("v").head().getSeq[Double](0).toArray
    // synthetic embeddings are near-uniform (no cluster structure for the
    // codebooks to exploit), so recall needs a deeper re-rank pool than
    // the refine=4 that suits real embedding distributions
    val pq = Similarity.pqSearch(index, qv, k = 10, refine = 12, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.knnBruteForce(spark, TestSpark.Sf0001, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall $recall too low (pq=$pq brute=$brute)")
  }

  test("langIdHeuristic on real multilingual samples") {
    val r = evalExpr(
      TextAnalysis.langIdHeuristic(lit("the cat and the dog is in the house")),
      TextAnalysis.langIdHeuristic(lit("der Hund und die Katze sind nicht hier")),
      TextAnalysis.langIdHeuristic(lit("le chat est dans la maison")),
      TextAnalysis.langIdHeuristic(lit("el perro es grande y los gatos")),
      TextAnalysis.langIdHeuristic(lit("这是一个中文句子")),
      TextAnalysis.langIdHeuristic(lit("zzz qqq www")),
      // kana is exclusively Japanese — must NOT land in the zh bucket,
      // including mixed kanji+kana text (Han alone stays zh)
      TextAnalysis.langIdHeuristic(lit("これはテストです")),
      TextAnalysis.langIdHeuristic(lit("日本語のテスト")))
    assert(r.getString(0) == "en")
    assert(r.getString(1) == "de")
    assert(r.getString(2) == "fr")
    assert(r.getString(3) == "es")
    assert(r.getString(4) == "zh")
    assert(r.getString(5) == "und")
    assert(r.getString(6) == "ja")
    assert(r.getString(7) == "ja")
  }

  test("gopherQualityFlags: good doc passes, degenerate docs fail the right rule") {
    val good = ("the data pipeline reads and writes rows of structured text " * 5).trim
    val tooShort = "tiny doc of words"
    val symbols = ("# ## ### " * 30) + "the a of and in words here now"
    val noAlpha = ("123 456 789 " * 20).trim + " the of a and"
    val r = evalExpr(
      TextAnalysis.gopherQualityFlags(lit(good)).getField("pass"),
      TextAnalysis.gopherQualityFlags(lit(tooShort)).getField("word_count_ok"),
      TextAnalysis.gopherQualityFlags(lit(symbols)).getField("symbol_ratio_ok"),
      TextAnalysis.gopherQualityFlags(lit(noAlpha)).getField("alpha_ratio_ok"),
      TextAnalysis.duplicateLineFraction(lit("a\nb\na\nc")),
      TextAnalysis.duplicateLineFraction(lit("x\ny")))
    assert(r.getBoolean(0), "good doc should pass")
    assert(!r.getBoolean(1), "short doc fails word count")
    assert(!r.getBoolean(2), "symbol-heavy doc fails symbol ratio")
    assert(!r.getBoolean(3), "numeric doc fails alpha ratio")
    assert(r.getDouble(4) == 0.25)
    assert(r.getDouble(5) == 0.0)
  }

  test("quality metrics: counts and ratios") {
    val r = evalExpr(
      TextAnalysis.tokenCount(lit("a b b c")),
      TextAnalysis.uniqueTokenCount(lit("a b b c")),
      TextAnalysis.stopwordCount(lit("the cat of doom")),
      TextAnalysis.avgTokenLen(lit("ab cd")))
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 2.0)
  }

  test("redactPii: typed placeholders, counts, clean text untouched") {
    val r = evalExpr(
      TextAnalysis.redactPii(lit("mail a.b+c@x-y.example.co.uk now")),
      TextAnalysis.redactPii(lit("host 192.168.0.1 up")),
      TextAnalysis.redactPii(lit("call +44 20 7946 0958 now")),
      TextAnalysis.redactPii(lit("all clean words here")),
      TextAnalysis.piiCount(lit("a@b.com and c@d.org"), TextAnalysis.EmailRe),
      TextAnalysis.redactPii(lit("p7@mail.example.com from 10.0.7.7 call +15550007")))
    assert(r.getString(0) == "mail <EMAIL> now")
    assert(r.getString(1) == "host <IP> up")
    assert(r.getString(2) == "call <PHONE> now")
    assert(r.getString(3) == "all clean words here")
    assert(r.getLong(4) == 2L)
    assert(r.getString(5) == "<EMAIL> from <IP> call <PHONE>")
  }

  /** Reference labeling for [[ccAgainstUnionFind]]: plain driver-side
    * union-find over the same edges. */
  private def unionFindLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccAgainstUnionFind(edges: Seq[(Long, Long)], hint: String): Unit = {
    val got = Dedup.connectedComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFindLabels(edges), hint)
  }

  test("connectedComponents matches union-find on chain, cliques, and random graph") {
    // 64-node chain: worst case for naive min-propagation (diameter 63);
    // the star-contraction rounds must still converge inside maxIter=20.
    ccAgainstUnionFind((1L until 64L).map(i => (i, i + 1)), "long chain")
    // two cliques + an isolated pair + a self-loop-only node (must still
    // be labeled, as its own singleton component)
    val cliques =
      (for { a <- 10L to 14L; b <- 10L to 14L if a < b } yield (b, a)) ++
      (for { a <- 20L to 25L; b <- 20L to 25L if a < b } yield (a, b)) ++
      Seq((100L, 99L), (77L, 77L))
    ccAgainstUnionFind(cliques, "cliques + pair + self-loop")
    // deterministic pseudo-random graph with self-loops and dup edges
    val rng = new scala.util.Random(7)
    val rand = Seq.fill(200)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
    ccAgainstUnionFind(rand, "random graph")
  }

  test("dupClusters labels simhash pairs transitively; canonicalKeep drops non-canonicals") {
    val clusters = Dedup.dupClusters(spark, TestSpark.Sf0001)
    val rows = clusters.collect()
    // every cluster id is a member of its own cluster and is the minimum
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      val ids = members.map(_.getLong(0))
      assert(ids.min == cid, s"cluster $cid min should be the label")
      assert(members.forall(_.getLong(2) == members.length), "cluster_size consistent")
      assert(members.count(_.getBoolean(3)) == 1, "exactly one canonical per cluster")
    }
    // clusters cover exactly the nodes of the pair graph, transitively
    val pairs = Dedup.simhashPairs(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_.getLong(0)).toSet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == unionFindLabels(pairs))
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val kept = Dedup.canonicalKeep(docs, clusters)
    assert(kept.count() == docs.count() - rows.count(r => !r.getBoolean(3)))
  }

  test("curationPipeline: verdicts compose stage outputs; kept = AND of gates") {
    import graft.scale.{TextAnalysis, TrainingData}
    val v = TrainingData.curationPipeline(spark, TestSpark.Sf0001).collect()
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    assert(v.length == docs.count(), "one verdict row per document")
    // kept is exactly the conjunction of the five gates
    v.foreach { r =>
      val gates = (2 to 6).map(r.getBoolean)
      assert(r.getBoolean(7) == gates.forall(identity),
        s"kept must equal AND of gates for doc ${r.getLong(0)}")
    }
    // stage agreement with the standalone operators
    val qPass = TextAnalysis.qualityFilter(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(v.forall(r => r.getBoolean(2) == qPass(r.getLong(0))),
      "q_pass must match the standalone quality filter")
    val nonCanon = Dedup.dupClusters(spark, TestSpark.Sf0001)
      .filter(!col("is_canonical")).collect().map(_.getLong(0)).toSet
    assert(v.forall(r => r.getBoolean(5) == !nonCanon(r.getLong(0))),
      "near_keep must match the cluster canonicals")
    // held-out docs are never kept
    assert(v.filter(r => r.getLong(0) % 97 == 0).forall(!_.getBoolean(7)),
      "benchmark docs must be excluded")
  }

  test("chunk: budget/overlap offsets, clipped tail, md5 content") {
    import graft.scale.TrainingData
    val docs = Seq((1L, (1 to 25).map(i => s"w$i").mkString(" ")), (2L, "a b c"))
      .toDF("doc_id", "text")
    val out = TrainingData.chunk(docs, budget = 10, overlap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 25 tokens, budget 10, overlap 2, step 8 → starts 0,8,16 (a start at
    // 24 would chunk only token 25, already inside chunk 16..25 — skipped)
    assert(d1.map(_._3).toSeq == Seq(0L, 8L, 16L))
    assert(d1.map(_._4).toSeq == Seq(10L, 10L, 9L))
    // consecutive chunks share `overlap` tokens: chunk0 tokens 1..10,
    // chunk1 tokens 9..18
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d1(0)._5 == md5hex((1 to 10).map(i => s"w$i").mkString(" ")))
    assert(d1(1)._5 == md5hex((9 to 18).map(i => s"w$i").mkString(" ")))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == 3L && d2.head._5 == md5hex("a b c"))
  }

  test("sourceMix: keep rate never quantizes to zero; budget met on inflated corpus") {
    import graft.scale.TrainingData
    // The original integer-percent formulation floored to 0 once a source
    // exceeded 100x the token budget — the mix silently emptied at 30x
    // inflation. The continuous rate must keep every source represented
    // and land tokens_kept in the Bernoulli neighborhood of the target.
    val small = TrainingData.sourceMix(spark, TestSpark.Sf0001).collect()
    assert(small.nonEmpty && small.forall(_.getDouble(1) > 0.0))
    val dir = graft.tools.Inflate.ensureX10(spark)
    val rows = TrainingData.sourceMix(spark, dir).collect()
    assert(rows.nonEmpty, "inflated mix must not be empty")
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0, s"source ${r.getString(0)} rate quantized to 0")
      val kept = r.getLong(3)
      assert(kept > 100L && kept < 3200L,
        s"source ${r.getString(0)} kept $kept tokens, target 800")
    }
  }

  test("temperatureMix: alpha=1/2 flattens the mix toward low-resource sources") {
    val out = graft.scale.TrainingData.temperatureMix(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty)
    // every rate is a probability, and kept <= n
    out.foreach { case (_, n, rate, kept) =>
      assert(rate > 0.0 && rate <= 1.0); assert(kept <= n)
    }
    // flattening is a property of the RATES (realized counts carry
    // Bernoulli noise on small sources): rate_i ∝ 1/sqrt(n_i), so a
    // strictly smaller source never gets a lower acceptance rate
    out.sortBy(_._2).sliding(2).foreach {
      case Array(small, big) =>
        if (small._2 < big._2)
          assert(small._3 >= big._3 - 1e-12,
            s"smaller source ${small._1} rate ${small._3} < ${big._1} rate ${big._3}")
      case _ => () // single-source corpus: nothing to compare
    }
  }

  test("semanticKeep: exactly one representative per cluster, planted copies dropped") {
    val out = Similarity.semanticKeep(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // one kept member per cluster, cluster sizes consistent
    out.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.count(_._4) == 1, s"cluster $cid kept ${rows.count(_._4)}")
      assert(rows.forall(_._3 == rows.length))
    }
    // planted copies (vec_id >= 1e6) cluster with their base and are never
    // the kept representative (min-id policy picks the base)
    val planted = out.filter(_._1 >= 1000000L)
    assert(planted.nonEmpty)
    planted.foreach { case (id, cid, sz, kept) =>
      assert(!kept && sz >= 2 && cid == id - 1000000L)
    }
  }

  test("epochShuffle: gapless replayable permutation, epoch-dependent order") {
    val docs = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def perm(epoch: Int) = graft.scale.TrainingData.epochShuffle(docs, epoch)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val p1 = perm(1)
    assert(p1.values.toSeq.sorted == (1L to 100L)) // gapless 1..N
    assert(p1 == perm(1))                          // replayable
    assert(p1 != perm(2))                          // epoch changes the order
    assert(p1 != (1L to 100L).map(i => i -> i).toMap) // actually shuffled
  }

  test("keyProfile: exact positional percentiles on a hand-built skewed frame") {
    // counts sorted by (cnt, key): (1,c) (1,d) (2,b) (10,a); n = 4
    // p50 -> rank 2 -> 1; p90/p99 -> rank 4 -> 10; skew = 40000 div 14
    val rows = Seq.fill(10)("a") ++ Seq("b", "b", "c", "d")
    val out = graft.operators.Skew.keyProfile(rows.toDF("k"), col("k")).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((4L, 14L, 10L, 1L, 10L, 10L, 2857L)))
  }

  test("importance: hand-computed rational quantized weights") {
    // fc: a(cr=3,ct=2) b(1,1) c(1,0); Tr=5, Tt=3
    // w(a)=15e6 div 12=1250000; w(b)=10e6 div 6=1666666; w(c)=5e6 div 6=833333
    val docs = Seq(
      (1L, "a a b", "en"),
      (2L, "a c", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = graft.scale.TrainingData.importance(docs, col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L * 1250000L + 1666666L, (2L * 1250000L + 1666666L) / 3L),
      (2L, 2L, 1250000L + 833333L, (1250000L + 833333L) / 2L)))
    // the target-slice doc is more target-like than the raw-only doc
    assert(out(0)._4 > out(1)._4)
  }

  test("novelty: first occurrence wins in doc_id order; full repeats score 0") {
    val docs = Seq(
      (1L, "a b c d"),   // "a b c", "b c d" — both novel
      (2L, "a b c x"),   // "a b c" seen, "b c x" novel → 0.5
      (3L, "a b c d")    // both shingles seen in doc 1 → 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.novelty(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)))
  }

  test("overlapBySource: pairwise shingle Jaccard, zero-overlap pairs absent") {
    val docs = Seq(
      (1L, "a b c d", "A"), // A: {a b c, b c d}
      (2L, "a b c x", "B"), // B: {a b c, b c x}
      (3L, "q r s t", "C")  // C: disjoint
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.overlapBySource(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(("A", "B", 2L, 2L, 1L, 1.0 / 3.0)))
  }

  test("batchByLength: longest-first in-band batches, exact padding waste") {
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(3, 4, 5, 6, 7, 8).zipWithIndex
      .map { case (n, i) => (i + 1L, doc(n)) }.toDF("doc_id", "text")
    val out = graft.scale.TrainingData.batchByLength(docs, bandWidth = 4L, batchSize = 2)
      .orderBy("bucket", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 0L, 1L, 3L, 3L, 0L),   // band [0,4): the 3-token doc alone
      (1L, 0L, 2L, 7L, 13L, 1L),  // band [4,8): 7+6 → pad 6 up to 7
      (1L, 1L, 2L, 5L, 9L, 1L),   //             5+4 → pad 4 up to 5
      (2L, 0L, 1L, 8L, 8L, 0L)))  // band [8,12): the 8-token doc
  }
}
