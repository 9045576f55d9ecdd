package graft

import org.apache.spark.sql.functions._

import graft.scale.Layout

/** Z-order clustering: multi-dimensional locality that a plain sort
  * cannot give. */
class LayoutSpec extends SparkSpec {

  private def orders = graft.sources.Tables.orders(spark, TestSpark.Sf0001)

  private def avgFrac(report: org.apache.spark.sql.DataFrame,
                      col_ : String): Double = {
    val rows = report.collect()
    rows.map(_.getAs[Double](s"frac_$col_")).sum / rows.length
  }

  test("zorder bounds per-split ranges on BOTH dimensions; a sort does not") {
    val cols = Seq("o_custkey", "o_orderdate")
    val z = Layout.zorder(orders, cols, numFiles = 16)
    val zRep = Layout.localityReport(z, cols)
    val zCust = avgFrac(zRep, "o_custkey")
    val zDate = avgFrac(zRep, "o_orderdate")
    // plain sort on custkey: perfect on custkey, no locality on date
    val sorted = orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
    val sRep = Layout.localityReport(sorted, cols)
    val sCust = avgFrac(sRep, "o_custkey")
    val sDate = avgFrac(sRep, "o_orderdate")
    assert(zCust < 0.5, s"z-order custkey locality too weak: $zCust")
    assert(zDate < 0.5, s"z-order date locality too weak: $zDate")
    assert(sCust < zCust, "plain sort should beat z-order on its own key")
    assert(sDate > 0.8, s"sorted layout unexpectedly local on date: $sDate")
    assert(zDate < sDate / 2,
      s"z-order date locality $zDate not clearly better than sort $sDate")
  }

  test("zvalue interleaves bits (hand-checked small case)") {
    import spark.implicits._
    // 2 cols, 2 bits, ranges [0,3]: bucket = value. z = interleave bits:
    // (x,y) -> bit i of x at 2i, bit i of y at 2i+1
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
    val got = df.select(Layout.zvalue(Seq(col("x"), col("y")),
        Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=2(10),y=1(01): bits -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3
    //   x0=0,y0=1,x1=1,y1=0 -> 0b0110 = 6
    assert(got == Seq(0L, 5L, 10L, 15L, 6L))
  }

  test("zvalue clamps out-of-range values and sends nulls to bucket 0") {
    import spark.implicits._
    // ranges [0,3] but values outside them: -5 clamps to bucket 0,
    // 99 clamps to bucket 3; a null column contributes bucket 0.
    val df = Seq((-5.0, Some(99.0)), (99.0, None))
      .toDF("x", "y")
    val got = df.select(Layout.zvalue(Seq(col("x"), col("y")),
        Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (-5→0, 99→3): y bits at odd positions -> 0b1010 = 10
    // (99→3, null→0): x bits at even positions -> 0b0101 = 5
    assert(got == Seq(10L, 5L))
  }

  test("zorder preserves every row and tolerates constant columns") {
    import spark.implicits._
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("a", "b")
    val out = Layout.zorder(df, Seq("a", "b"), numFiles = 2)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 7L), (2L, 7L), (3L, 7L)))
    assert(out.columns.toSeq == Seq("a", "b"))
  }

  test("hilbertIndex is a Hilbert curve: bijective and grid-adjacent over the full grid") {
    import spark.implicits._
    // The defining property, checked exhaustively at bits = 4 (a 16x16
    // grid): the index is a bijection onto [0, 256) and consecutive
    // indexes are Manhattan-distance-1 neighbors — the locality
    // guarantee z-order does NOT have (its seams jump across the grid).
    val bits = 4; val n = 1 << bits
    val cells = (for { x <- 0 until n; y <- 0 until n } yield (x.toDouble, y.toDouble))
      .toDF("x", "y")
    // identity bucketization: ranges chosen so bucket(v) = v exactly
    val ranges = Seq((0.0, (n - 1).toDouble), (0.0, (n - 1).toDouble))
    val got = Layout.hilbertIndex(cells, col("x"), col("y"), ranges, bits)
      .collect().map(r => (r.getLong(2), (r.getDouble(0).toInt, r.getDouble(1).toInt)))
    assert(got.map(_._1).sorted.toSeq == (0L until (n.toLong * n)).toSeq)
    val byD = got.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbertOrder preserves rows; Hilbert splits are at least as local as z-order's") {
    import spark.implicits._
    // 32x32 grid of points; cluster into 8 range-splits by each curve and
    // compare the mean per-split normalized span (localityReport's
    // fraction) — the Hilbert layout must not be WORSE than Morton.
    val pts = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    def meanSpan(clustered: org.apache.spark.sql.DataFrame): Double = {
      val rep = Layout.localityReport(clustered, Seq("x", "y"))
        .agg(avg((col("frac_x") + col("frac_y")) / 2)).head().getDouble(0)
      rep
    }
    val hil = Layout.hilbertOrder(pts, "x", "y", numFiles = 8, bits = 5)
    val zor = Layout.zorder(pts, Seq("x", "y"), numFiles = 8, bits = 5)
    assert(hil.count() == 1024 && zor.count() == 1024)
    val (hSpan, zSpan) = (meanSpan(hil), meanSpan(zor))
    assert(hSpan <= zSpan + 1e-9,
      s"hilbert mean split span $hSpan worse than z-order $zSpan")
  }

  test("delta profile: deltas reconstruct the value span; varint bounded by raw") {
    val p = graft.scale.Layout
      .deltaEncodingProfile(spark, TestSpark.Sf0001).collect()
    assert(p.nonEmpty)
    val span = graft.sources.Tables.orders(spark, TestSpark.Sf0001)
      .agg(((max(col("o_totalprice").cast("decimal(18,2)")) -
        min(col("o_totalprice").cast("decimal(18,2)"))) * 100).cast("long"))
      .head().getLong(0)
    assert(p.map(_.getLong(2)).sum == span) // telescoping sum of deltas
    p.foreach { r =>
      assert(r.getLong(3) >= r.getLong(1))      // >= 1 byte per delta
      assert(r.getLong(3) <= r.getLong(4))      // varint never exceeds raw
    }
  }
}
