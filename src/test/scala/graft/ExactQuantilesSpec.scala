package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ExactQuantiles

/** The value-histogram percentile formulation must equal Spark's own
  * `percentile()` (which shares the p·(n−1) interpolation definition)
  * on arbitrary data: duplicates, nulls, negatives, single values, and
  * a deterministic pseudo-random mix. */
class ExactQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val probs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  private def compare(rows: Seq[(java.lang.Double, java.lang.Double)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("a", "b")
    val hist = ExactQuantiles.byHistogram(df, Seq("a", "b"), probs, dp = 9)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val probArr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val ref = df.agg(
      expr(s"percentile(a, $probArr)").as("qa"),
      expr(s"percentile(b, $probArr)").as("qb")).collect()(0)
    for ((cn, qi) <- Seq("a" -> 0, "b" -> 1); (p, i) <- probs.zipWithIndex) {
      val refSeq = ref.getSeq[Double](qi)
      val expect = if (refSeq == null || refSeq.isEmpty) None
        else Some(BigDecimal(refSeq(i))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val got = hist.get((cn, p))
      (expect, got) match {
        case (Some(e), Some(g)) =>
          assert(math.abs(e - g) < 1e-8, s"col $cn p=$p: $e vs $g")
        case (None, None) => ()
        case other => fail(s"col $cn p=$p: presence mismatch $other")
      }
    }
  }

  test("duplicates, negatives, and nulls") {
    compare(Seq[(java.lang.Double, java.lang.Double)](
      (1.0, -5.5), (1.0, -5.5), (2.0, null), (2.0, 0.0), (2.0, 0.0),
      (3.5, 7.25), (3.5, 7.25), (3.5, 7.25), (-1.0, 100.0), (null, 100.0)))
  }

  test("single distinct value") {
    compare(Seq[(java.lang.Double, java.lang.Double)](
      (4.0, 9.0), (4.0, 9.0), (4.0, 9.0)))
  }

  test("deterministic pseudo-random mix") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      val a: java.lang.Double =
        if (i % 17 == 0) null else math.floor(rnd.nextDouble() * 40) / 4.0
      val b: java.lang.Double = rnd.nextGaussian() * 1000
      (a, b)
    }
    compare(rows)
  }

  test("fully-null column still emits the (col, p, null) grid") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, null), (3.0, null)).toDF("a", "b")
    val out = ExactQuantiles.byHistogram(df, Seq("a", "b"), probs)
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.length == probs.size * 2)
    val bRows = out.filter(_._1 == "b")
    assert(bRows.length == probs.size && bRows.forall(_._3.isEmpty))
    assert(out.filter(_._1 == "a").forall(_._3.nonEmpty))
  }

  test("bySortSelect equals percentile() on a random mix; empty-safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows: Seq[java.lang.Double] = (1 to 700).map { i =>
      if (i % 13 == 0) null
      else java.lang.Double.valueOf(rnd.nextGaussian() * 50)
    }
    val df = rows.toDF("x").repartition(7)
    val ps = Seq(0.25, 0.5, 0.75)
    val got = ExactQuantiles.bySortSelect(df, "x", ps)
    val probArr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val ref = df.agg(expr(s"percentile(x, $probArr)")).collect()(0)
      .getSeq[Double](0)
    ps.zipWithIndex.foreach { case (p, i) =>
      assert(math.abs(got(p) - ref(i)) < 1e-9, s"p=$p")
    }
    // single row: every quantile is that value
    val one = ExactQuantiles.bySortSelect(
      Seq(java.lang.Double.valueOf(42.0)).toDF("x"), "x", ps)
    assert(ps.forall(p => one(p) == 42.0))
    // empty and all-null inputs yield an empty map, no crash
    assert(ExactQuantiles.bySortSelect(
      Seq.empty[java.lang.Double].toDF("x"), "x", ps).isEmpty)
    assert(ExactQuantiles.bySortSelect(
      Seq[java.lang.Double](null, null).toDF("x"), "x", ps).isEmpty)
  }

  test("NDV gate routes a continuous high-NDV column to sort-select, " +
      "still exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // a: 4 distinct values (histogram path); b: ~2000 distinct (over a
    // cap of 100 → sort-select path)
    val rows = (1 to 2000).map(i => ((i % 4).toDouble, rnd.nextDouble()))
    val df = rows.toDF("a", "b")
    val (histCols, sortCols) =
      ExactQuantiles.splitByNdv(df, Seq("a", "b"), ndvCap = 100)
    assert(histCols == Seq("a") && sortCols == Seq("b"))
    // gated output covers the full grid and BOTH paths return the exact
    // interpolated values (the over-cap path fired for real at sf1 —
    // a silent approx fallback there broke the quantile_cont oracle)
    val gated = ExactQuantiles.gated(df, Seq("a", "b"), probs, ndvCap = 100)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(gated.size == probs.size * 2)
    val exact = ExactQuantiles.byHistogram(df, Seq("a", "b"), probs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
    assert(exact.size == gated.size)
    exact.foreach { case (k, v) => assert(gated(k) == v, s"$k") }
  }

  test("non-numeric string column through gated() sort-select path: " +
      "cast-nulled values don't inflate the count (regression)") {
    import spark.implicits._
    // Mixed column: the cast("double") nulls the alphabetic cells, so a
    // PRE-cast count over-counts, ks exceeds the sorted row count, and
    // picked(k) used to throw NoSuchElementException. ndvCap=1 forces
    // the sort-select path for both columns.
    val rows = (1 to 400).map { i =>
      val s = if (i % 3 == 0) s"not-a-number-$i" else (i % 50).toString
      (s, i.toDouble)
    }
    val df = rows.toDF("s", "d")
    val out = ExactQuantiles.gated(df, Seq("s", "d"), probs, ndvCap = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out.size == probs.size * 2)
    // values must equal percentile() over the SAME post-cast column
    val probArr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val ref = df.agg(
      expr(s"percentile(TRY_CAST(s AS DOUBLE), $probArr)").as("qs"),
      expr(s"percentile(d, $probArr)").as("qd")).collect()(0)
    for ((cn, qi) <- Seq("s" -> 0, "d" -> 1); (p, i) <- probs.zipWithIndex) {
      val e = ref.getSeq[Double](qi)(i)
      val g = out((cn, p)).get
      assert(math.abs(e - g) < 1e-6, s"col $cn p=$p: $e vs $g")
    }
    // an ALL-non-numeric string column must emit the null grid, not throw
    val allBad = (1 to 50).map(i => s"x$i").toDF("s")
    val nullGrid = ExactQuantiles.gated(allBad, Seq("s"), probs, ndvCap = 1)
      .collect()
    assert(nullGrid.length == probs.size && nullGrid.forall(_.isNullAt(2)))
  }
}
