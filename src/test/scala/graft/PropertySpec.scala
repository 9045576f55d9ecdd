package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Normalize, Parsing}

/** ScalaCheck-generator property tests for the expression library
  * (SURVEY.md §5 test plan: "ScalaCheck properties for parsers —
  * round-trip, null-safety"). Raw generators with fixed seeds (the
  * scalatest-plus bridge isn't in the offline dependency cache), each
  * property evaluated as ONE batched Spark job over all samples.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("parseScore round-trips any h-a / h:a pair") {
    val cases = samples(Gen.zip(Gen.choose(0, 99), Gen.choose(0, 99), Gen.oneOf("-", ":")))
    val df = cases.map { case (h, a, sep) => (h, a, s"$h$sep$a") }.toDF("h", "a", "s")
      .withColumn("parsed", Parsing.parseScore(col("s")))
    val bad = df.filter(
      col("parsed.home_score") =!= col("h") || col("parsed.away_score") =!= col("a"))
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("cleanText is idempotent and never returns empty strings") {
    val gen = Gen.listOf(Gen.oneOf(" ", "\t", "a", "b", "  ", "c d")).map(_.mkString)
    val df = samples(gen).toDF("s")
      .withColumn("once", Parsing.cleanText(col("s")))
      .withColumn("twice", Parsing.cleanText(Parsing.cleanText(col("s"))))
    assert(df.filter(!(col("once") <=> col("twice"))).count() == 0)
    assert(df.filter(col("once") === "").count() == 0)
  }

  test("slugify emits only [a-z0-9-] with no edge dashes") {
    val gen = Gen.listOfN(3,
      Gen.oneOf("FC Köln", "St. Pauli!", "Real", "1860", "ßig", "  x  ")).map(_.mkString(" "))
    val df = samples(gen).toDF("s").withColumn("slug", Parsing.slugify(col("s")))
    assert(df.filter(!col("slug").rlike("^[a-z0-9-]*$")).count() == 0)
    assert(df.filter(col("slug").rlike("(^-|-$)")).count() == 0)
  }

  test("fuzzyRatio: bounds, symmetry, identity") {
    val names = Gen.oneOf("bayern", "borussia dortmund", "fc", "schalke 04",
      "st pauli", "arminia", "x", "")
    val df = samples(Gen.zip(names, names)).toDF("a", "b")
      .withColumn("ab", Normalize.fuzzyRatio(col("a"), col("b")))
      .withColumn("ba", Normalize.fuzzyRatio(col("b"), col("a")))
      .withColumn("aa", Normalize.fuzzyRatio(col("a"), col("a")))
    assert(df.filter(col("ab") < 0 || col("ab") > 100).count() == 0)
    assert(df.filter(col("ab") =!= col("ba")).count() == 0)
    assert(df.filter(col("aa") =!= 100).count() == 0)
  }

  test("toDecimalOdds: every valid format yields decimal odds > 1") {
    val frac = Gen.zip(Gen.choose(1, 20), Gen.choose(1, 20)).map { case (a, b) => s"$a/$b" }
    val amer = Gen.oneOf(Gen.choose(100, 900).map(n => s"+$n"), Gen.choose(100, 900).map(n => s"-$n"))
    val dec = Gen.choose(101, 900).map(n => f"${n / 100.0}%.2f")
    val df = samples(Gen.oneOf(frac, amer, dec), 120).toDF("s")
      .withColumn("odds", Parsing.toDecimalOdds(col("s")))
    val bad = df.filter(col("odds").isNull || col("odds") <= 1.0)
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("externalId: no collisions across distinct key tuples") {
    val gen = Gen.zip(Gen.alphaStr, Gen.alphaStr)
    val pairs = samples(gen, 200).distinct
    val df = pairs.toDF("a", "b")
      .withColumn("id", Parsing.externalId(col("a"), col("b")))
    assert(df.select("id").distinct().count() == pairs.length)
  }

  test("FbrefStats.toNumber: plain ints and stoppage sums agree with arithmetic") {
    import graft.sources.FbrefStats
    val ints = samples(Gen.choose(0, 500), 80)
    val stoppage = samples(Gen.zip(Gen.choose(1, 90), Gen.choose(1, 15)), 80)
    val df = (ints.map(i => (i.toString, i.toDouble)) ++
        stoppage.map { case (a, b) => (s"$a+$b", (a + b).toDouble) })
      .toDF("s", "expected")
      .withColumn("got", FbrefStats.toNumber(col("s")))
    assert(df.filter(!(col("got") <=> col("expected"))).count() == 0)
    // garbage never throws, always null
    val junk = samples(Gen.alphaStr.suchThat(_.nonEmpty), 50).toDF("s")
      .withColumn("got", FbrefStats.toNumber(col("s")))
    assert(junk.filter(col("got").isNotNull).count() == 0)
  }

  test("TrainingData.hashBucket: range [0,100), deterministic, roughly uniform") {
    import graft.scale.TrainingData
    val keys = (0L until 2000L).toDF("k")
    val b = keys.select(TrainingData.hashBucket(col("k")).as("b"))
    assert(b.filter(col("b") < 0 || col("b") >= 100).count() == 0)
    val again = keys.select(TrainingData.hashBucket(col("k")).as("b"))
    assert(b.collect().map(_.getLong(0)).toSeq == again.collect().map(_.getLong(0)).toSeq)
    // each decile within a loose tolerance of the expected 200
    val deciles = b.groupBy((col("b") / 10).cast("int").as("d")).count().collect()
    assert(deciles.length == 10)
    deciles.foreach(r => assert(math.abs(r.getLong(1) - 200L) < 100,
      s"decile ${r.getInt(0)} has ${r.getLong(1)} keys"))
  }

  test("TrainingData.hashUniform: [0,1), deterministic, keep rate tracks weight") {
    import graft.scale.TrainingData
    val keys = (0L until 2000L).toDF("k")
    val u = keys.select(TrainingData.hashUniform(col("k")).as("u"))
    assert(u.filter(col("u") < 0.0 || col("u") >= 1.0).count() == 0)
    assert(u.collect().map(_.getDouble(0)).toSeq ==
      keys.select(TrainingData.hashUniform(col("k")).as("u"))
        .collect().map(_.getDouble(0)).toSeq)
    // Bernoulli keep rate within a loose band of the acceptance weight
    for (w <- Seq(0.2, 0.5, 0.8)) {
      val kept = keys.filter(TrainingData.bernoulliKeep(col("k"), lit(w))).count()
      assert(math.abs(kept - 2000 * w) < 120, s"w=$w kept=$kept")
    }
  }

  test("entityTypeFromUrl: total function over arbitrary URLs, never throws") {
    val gen = Gen.listOfN(4,
      Gen.oneOf("match", "spieler", "x", "verein", "99", "trainer", "")).map(
      parts => "https://site.example/" + parts.mkString("/"))
    val out = samples(gen, 120).toDF("url")
      .withColumn("t", Parsing.entityTypeFromUrl(col("url")))
    val allowed = Set("match", "referee", "stadium", "player", "coach", "team", "unknown")
    assert(out.collect().forall(r => allowed.contains(r.getString(1))))
  }

  test("redactPii is idempotent (placeholders never re-match any pattern)") {
    import graft.scale.TextAnalysis
    val gen = Gen.listOfN(5, Gen.oneOf(
      "plain words", "a@b.com", "x.y+z@mail.example.org", "10.0.0.1",
      "+49 30 1234567", "+15550001234", "192.168.254.254", "dot.ted",
      "+", "@", "1.2.3", "price 42")).map(_.mkString(" "))
    val df = samples(gen, 80).toDF("s")
      .withColumn("once", TextAnalysis.redactPii(col("s")))
      .withColumn("twice", TextAnalysis.redactPii(TextAnalysis.redactPii(col("s"))))
    assert(df.filter(!(col("once") <=> col("twice"))).count() == 0)
  }

  test("chunk covers every token exactly; no chunk content-contained in its predecessor") {
    import graft.scale.TrainingData
    val gen = Gen.choose(1, 60)
    val docs = samples(gen, 40).zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(t => s"t$t").mkString(" ")) }
      .toDF("doc_id", "text")
    val budget = 10; val overlap = 3; val step = budget - overlap
    val chunks = TrainingData.chunk(docs, budget, overlap)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    docs.collect().foreach { d =>
      val n = d.getString(1).split(" ").length
      val cs = chunks(d.getLong(0)).sortBy(_._2)
      // full coverage: first starts at 0, last reaches n, no gaps
      assert(cs.head._2 == 0L)
      assert(cs.last._2 + cs.last._3 == n.toLong, s"tail not covered for n=$n")
      cs.sliding(2).foreach {
        case Array((_, s1, t1), (_, s2, _)) =>
          assert(s2 <= s1 + t1, s"gap between chunks at n=$n")
          assert(s2 + budget > s1 + t1 || s2 == s1,
            s"chunk at $s2 adds no new content (n=$n)")
        case _ => ()
      }
      // no chunk is fully inside the previous one's token range
      cs.sliding(2).foreach {
        case Array((_, s1, t1), (_, s2, t2)) =>
          assert(s2 + t2 > s1 + t1, s"contained chunk at n=$n")
        case _ => ()
      }
    }
  }

  test("bpeishTokenCount: >= whitespace count on single-spaced text, additive under concat") {
    import graft.scale.TextAnalysis
    val word = Gen.oneOf("abc", "x1", "12", "a-b", "$5.0", "hey!", "v2")
    val gen = Gen.listOfN(6, word).map(_.mkString(" "))
    val df = samples(gen, 50).toDF("s")
      .withColumn("ws", size(split(col("s"), " ")).cast("long"))
      .withColumn("bpe", TextAnalysis.bpeishTokenCount(col("s")))
    // every whitespace word decomposes into >= 1 BPE-ish token
    assert(df.filter(col("bpe") < col("ws")).count() == 0)
    // concatenating with a space splits at the boundary: counts add
    val pairs = samples(Gen.zip(gen, gen), 30).toDF("a", "b")
      .withColumn("joint",
        TextAnalysis.bpeishTokenCount(concat(col("a"), lit(" "), col("b"))))
      .withColumn("parts",
        TextAnalysis.bpeishTokenCount(col("a")) + TextAnalysis.bpeishTokenCount(col("b")))
    assert(pairs.filter(col("joint") =!= col("parts")).count() == 0)
  }

  test("spanDedup: conservation and no-op on span-unique corpora") {
    import graft.scale.Search
    // generated docs with globally unique tokens -> every span unique ->
    // spanDedup must keep everything (n_kept == n_spans)
    val docs = (0 until 20).map { i =>
      val n = 5 + (i * 7) % 40
      (i.toLong, (0 until n).map(t => s"u${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Search.spanDedup(docs).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(1),
        s"doc ${r.getLong(0)}: kept ${r.getLong(2)} of ${r.getLong(1)} unique spans")
    }
  }

  test("season-stat value parsing matches the reference int/float semantics on generated inputs") {
    import graft.sources.BundesligaCrawl
    // Generated value texts over an HTML-safe alphabet (digit runs,
    // German thousands dots / decimal commas, units, junk, minus signs,
    // overlong digit runs). Driver reference replicates the Python:
    //   int:   re.search('-?\d+', v.replace('.','').replace(',','.'))
    //   float: re.search('-?\d+[.,]?\d*', v), ',' -> '.'
    // with int overflow degrading to null (try_cast), never an error.
    val atom = Gen.oneOf(
      Gen.choose(0, 99999).map(_.toString),
      Gen.const("1.234"), Gen.const("3,5"), Gen.const("-"), Gen.const("km/h x"),
      Gen.const("Spiele"), Gen.const(" "), Gen.const("-17"), Gen.const(","),
      Gen.const("."), Gen.const("99999999999999999999"))
    val gen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, atom)).map(_.mkString(" "))
    val cases = samples(gen, 80).distinct
    def clean(s: String) = s.trim.replaceAll("\\s+", " ")
    def refInt(v0: String): Option[Int] = {
      val v = clean(v0).replace(".", "").replace(",", ".")
      "-?\\d+".r.findFirstIn(v).flatMap(s => scala.util.Try(s.toInt).toOption)
    }
    def refFloat(v0: String): Option[Double] =
      "-?\\d+[.,]?\\d*".r.findFirstIn(clean(v0))
        .flatMap(s => scala.util.Try(s.replace(",", ".").toDouble).toOption)
    val pages = cases.zipWithIndex.map { case (v, i) =>
      (i.toLong,
        s"""<html><body><h1>P $i</h1>
           |<div class="row"><div class="key">Einsätze</div><div class="value">$v</div></div>
           |<div class="row"><div class="key">Laufdistanz</div><div class="value">$v</div></div>
           |</body></html>""".stripMargin)
    }.toDF("player_url", "html")
    val got = BundesligaCrawl.playersFromPages(pages)
      .select(col("player_url").cast("long"),
        col("season_stats.appearances"), col("season_stats.distance_km"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)),
         if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((v, i) <- cases.zipWithIndex) {
      // a pair only claims its slot when the value carries a digit
      val expInt = if (clean(v).exists(_.isDigit)) refInt(v) else None
      val expFloat = if (clean(v).exists(_.isDigit)) refFloat(v) else None
      assert(got(i.toLong)._1 == expInt, s"int of '$v'")
      assert(got(i.toLong)._2 == expFloat, s"float of '$v'")
    }
  }

  test("career table parsing: cell-count filter and isdigit guard on generated rows") {
    import graft.sources.BundesligaCrawl
    // rows with 0-7 cells; stat cells randomly digit-only / junk /
    // overlong digit runs; reference: rows[1:], keep >=3 cells,
    // stats only when isdigit (overflow -> null, not error)
    val cellGen = Gen.oneOf(
      Gen.choose(0, 500).map(_.toString), Gen.const("-"),
      Gen.const("x9"), Gen.const("12345678901234567890"))
    val rowGen = Gen.choose(0, 7).flatMap(n => Gen.listOfN(n, cellGen))
    val tables = samples(Gen.listOfN(5, rowGen), 30).zipWithIndex.map { case (rows, i) =>
      val body = rows.map(cells =>
        "<tr>" + cells.map(c => s"<td>$c</td>").mkString + "</tr>").mkString
      (i.toLong, rows,
        s"""<html><body><h1>P $i</h1><table class="statistik">
           |<tr><th>h</th></tr>$body</table></body></html>""".stripMargin)
    }
    val got = BundesligaCrawl.playersFromPages(
        tables.map(t => (t._1, t._3)).toDF("player_url", "html"))
      .select(col("player_url").cast("long").as("id"), col("senior_career"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    def refStat(c: Option[String]): Option[Int] =
      c.filter(s => s.nonEmpty && s.forall(_.isDigit))
        .flatMap(s => scala.util.Try(s.toInt).toOption)
    for ((id, rows, _) <- tables) {
      val expected = rows.filter(_.length >= 3)
      val parsed = got(id)
      assert(parsed.length == expected.length, s"table $id row count")
      parsed.zip(expected).foreach { case (p, cells) =>
        assert(p.getString(0) == cells(0) && p.getString(1) == cells(1)
          && p.getString(2) == cells(2), s"table $id positional cells")
        def opt(i: Int) = if (p.isNullAt(i)) None else Some(p.getInt(i))
        assert(opt(3) == refStat(cells.lift(3)), s"table $id appearances")
        assert(opt(4) == refStat(cells.lift(4)), s"table $id goals")
        assert(opt(5) == refStat(cells.lift(5)), s"table $id assists")
      }
    }
  }

  test("bookmaker odds parsing survives generated markup variation") {
    import graft.sources.SiteParsers
    // the selector config keys on CLASS SUBSTRINGS: random extra
    // classes, attribute order, and inter-element whitespace must not
    // change the extraction
    val junkAttr = Gen.oneOf("", " data-x=\"1\"", " id=\"e7\"", " aria-hidden=\"true\"")
    val pad = Gen.oneOf("", " ", "\n  ")
    val extraCls = Gen.oneOf("", "x-pad ", "zz-9 ")
    val gen = Gen.zip(Gen.zip(junkAttr, pad, extraCls),
      Gen.zip(Gen.choose(11, 89), Gen.choose(21, 79), Gen.choose(12, 95)))
    val cases = samples(gen, 40).zipWithIndex
    val pages = cases.map { case (((attr, p, ec), (h, d, a)), i) =>
      def span(cls: String, v: String) =
        s"""<span$attr class="$ec$cls">$v</span>$p"""
      (s"pg_$i",
        s"""<div class="$ec gl-Market_General"$attr>$p""" +
          span("gl-ParticipantFixtureDetails_TeamNames", s"Alpha $i") +
          span("gl-ParticipantFixtureDetails_TeamNames", s"Beta $i") +
          span("gl-ParticipantOddsOnly_Odds", s"${h / 10}.${h % 10}") +
          span("gl-ParticipantOddsOnly_Odds", s"${d / 10}.${d % 10}") +
          span("gl-ParticipantOddsOnly_Odds", s"${a / 10}.${a % 10}") + "</div>")
    }.toDF("snapshot_path", "html")
    val got = SiteParsers.bookmakerOddsFromPages(pages, SiteParsers.Bet365)
      .collect().map(r => r.getString(0) ->
        (r.getString(2), r.getString(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got.size == cases.size)
    for ((((_, _, _), (h, d, a)), i) <- cases) {
      val (ht, at, oh, od, oa) = got(s"pg_$i")
      assert(ht == s"Alpha $i" && at == s"Beta $i", s"teams of pg_$i")
      assert(oh == s"${h / 10}.${h % 10}".toDouble
        && od == s"${d / 10}.${d % 10}".toDouble
        && oa == s"${a / 10}.${a % 10}".toDouble, s"odds of pg_$i")
    }
  }

  test("market value parsing: generated German formats match driver arithmetic") {
    import graft.sources.SiteParsers
    // value text variants: "a,b Mio." / "n Tsd." / "n" with optional
    // thousands dots; reference semantics = strip dots, comma->dot,
    // scale by suffix
    val gen = Gen.zip(Gen.choose(1, 999), Gen.choose(0, 9), Gen.choose(0, 2))
    val cases = samples(gen, 50).distinct.zipWithIndex
    val rows = cases.map { case ((n, f, m), i) =>
      val (vt, want) = m match {
        case 0 => (s"$n,$f Mio.", s"$n.$f".toDouble * 1e6)
        case 1 => (s"$n Tsd.", n.toDouble * 1e3)
        case _ => (f"1.$n%03d", f"1$n%03d".toDouble) // "1.234" thousands dot
      }
      (s"p_$i", s"<html><body><div>$vt € Letzte Änderung: 01.02.2024</div></body></html>", want)
    }
    val got = SiteParsers.marketValueFromPages(
        rows.map(r => (r._1, r._2)).toDF("snapshot_path", "html"))
      .select("snapshot_path", "value_eur").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((id, _, want) <- rows)
      assert(got(id) == want, s"$id: got ${got(id)} want $want")
  }

  test("bm25: score strictly increases with tf of a query term") {
    import graft.scale.Search
    // same corpus, doc 1 has more 'q' occurrences than doc 2; equal length
    val docs = Seq(
      (1L, "q q q f1 f2 f3"),
      (2L, "q f4 f5 f6 f7 f8"),
      (3L, "z1 z2 z3 z4 z5 z6")).toDF("doc_id", "text")
    val scores = Search.bm25(docs, Seq("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    assert(!scores.contains(3L))
  }

  test("Courtside completeness gate ≡ reference is_incomplete_fixture over random node shapes") {
    // Model: the reference's dict logic (scraper_utils.py:63-81) under
    // the documented null≡absent convention — team evidence per side
    // (name or id), then score string, then xor/both on the individual
    // scores. Generated nodes cycle independent presence of every field.
    final case class Node(homeName: Boolean, homeId: Boolean, awayName: Boolean,
                          awayId: Boolean, score: Option[String],
                          hs: Option[Int], as_ : Option[Int])
    def model(n: Node): Boolean =
      !((n.homeName || n.homeId) && (n.awayName || n.awayId) &&
        (n.score.isDefined || (n.hs.isDefined && n.as_.isDefined)))
    def json(n: Node): String = {
      val team = (name: Boolean, id: Boolean, nm: String, tid: String) =>
        if (!name && !id) None
        else Some(Seq(
          if (name) Some(s""""name":"$nm"""") else None,
          if (id) Some(s""""id":"$tid"""") else None).flatten.mkString("{", ",", "}"))
      val fields = Seq(
        team(n.homeName, n.homeId, "H", "h1").map(t => s""""home":$t"""),
        team(n.awayName, n.awayId, "A", "a1").map(t => s""""away":$t"""),
        n.score.map(s => s""""score":"$s""""),
        n.hs.map(v => s""""homeScore":$v"""),
        n.as_.map(v => s""""awayScore":$v""")).flatten
      fields.mkString("{", ",", "}")
    }
    val gen = for {
      hn <- Gen.oneOf(true, false); hi <- Gen.oneOf(true, false)
      an <- Gen.oneOf(true, false); ai <- Gen.oneOf(true, false)
      sc <- Gen.oneOf(None, Some("2-1"), Some("vs"))
      hs <- Gen.oneOf(None, Some(1)); as_ <- Gen.oneOf(None, Some(0))
    } yield Node(hn, hi, an, ai, sc, hs, as_)
    val cases = samples(gen, 200)
    val df = cases.map(n => (json(n), model(n))).toDF("raw", "want")
    val node = graft.functions.JsonNorm.parseGameNode(col("raw"))
    val bad = df.filter(
      graft.sources.Courtside.isIncompleteFixture(node,
        graft.functions.JsonNorm.normalizeGameNode(node)) =!= col("want"))
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }

  test("winnowFingerprints matches an independent Scala winnow on random token streams") {
    import graft.scale.TextAnalysis.{WinnowK, WinnowW}
    // Independent reimplementation: direct per-window md5 minimum over
    // the same k-gram stream (java.security MessageDigest, no Spark).
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def winnowRef(text: String): Set[String] = {
      val toks = text.split(" ", -1)
      val grams = toks.sliding(WinnowK).filter(_.length == WinnowK)
        .map(g => md5hex(g.mkString(" "))).toVector
      if (grams.length < WinnowW) Set.empty
      else grams.sliding(WinnowW).filter(_.length == WinnowW).map(_.min).toSet
    }
    // Vocab includes tokens that repeat a lot (degenerate hash streams)
    // and lengths straddling the too-short boundary.
    val gen = for {
      n <- Gen.choose(1, 40)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "spark", "merge", "x1", "a"))
    } yield ts.mkString(" ")
    val cases = samples(gen, 120).distinct
    val df = cases.toDF("text").withColumn("fp",
      array_sort(graft.scale.TextAnalysis.winnowFingerprints(col("text"))))
    val got = df.select("text", "fp").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    cases.foreach { t =>
      val want = winnowRef(t).toVector.sorted
      assert(got(t) == want, s"mismatch for '$t': got ${got(t)}, want $want")
    }
  }

  test("novelty conserves the corpus distinct-shingle count") {
    // small vocab forces cross-doc shingle collisions
    val gen = Gen.choose(3, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e")))
    val docsSeq = samples(gen, 25).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    val out = graft.scale.TextAnalysis.novelty(docsSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // every shingle is novel for exactly one doc ⇒ Σ n_novel = |global set|
    val globalSet = docsSeq.flatMap { case (_, t) =>
      val toks = t.split(" ")
      if (toks.length < 3) Seq.empty[String]
      else toks.sliding(3).map(_.mkString(" ")).toSeq
    }.toSet
    assert(out.map(_._2).sum == globalSet.size.toLong)
    out.foreach { case (nSh, nNov) => assert(nNov <= nSh) }
  }

  test("join-size prediction equals the measured equi-join size") {
    val aSeq = samples(Gen.choose(1, 10), 50).zipWithIndex
      .map { case (k, i) => (k.toLong, i.toLong) }
    val bSeq = samples(Gen.choose(1, 12), 70).zipWithIndex
      .map { case (k, i) => (k.toLong, i.toLong) }
    val (a, b) = (aSeq.toDF("k", "va"), bSeq.toDF("k", "vb"))
    val pred = graft.operators.Skew.joinSizeEstimate(a, col("k"), b, col("k"))
      .head().getLong(1)
    assert(pred == a.join(b, "k").count())
  }

  test("k-cores are nested: 3-core nodes are a subset of 2-core nodes") {
    val g = samples(Gen.zip(Gen.choose(1L, 15L), Gen.choose(1L, 15L)), 45)
      .filter(p => p._1 != p._2)
    def core(k: Int) = graft.operators.KCore
      .kcore(g.toDF("a", "b"), k, rounds = 10)
      .collect().map(_.getLong(0)).toSet
    val (c2, c3) = (core(2), core(3))
    assert(c3.subsetOf(c2), s"3-core $c3 not within 2-core $c2")
  }
}
