package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.OrderDetect
import graft.profiler.Profiler

/** Order detection, char vocab, and datetime-format discovery — the
  * round-3 per-column stats, tested against hand-computable inputs. */
class ColumnStatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("OrderDetect classifies asc/desc/constant/random across partitions") {
    val df = (1 to 1000).map(i =>
      (i.toLong, i.toLong, -i.toLong, 5L, (i * 2654435761L) % 1000))
      .toDF("k", "asc", "desc", "const", "rand")
      .repartition(7) // scramble physical layout; detect() re-ranges on k
    val r = OrderDetect.detect(df, "k", Seq("asc", "desc", "const", "rand"))
    assert(r("asc").order == "ascending")
    assert(r("desc").order == "descending")
    assert(r("const").order == "constant")
    assert(r("rand").order == "random")
    // counts include the partition-seam comparisons: n-1 total diffs
    assert(r("asc").nIncr == 999 && r("asc").nDecr == 0)
    assert(r("const").nEq == 999)
  }

  test("OrderDetect handles nulls and strings") {
    val df = Seq((1L, Some(1L), "a"), (2L, None, "b"), (3L, Some(3L), "c"),
      (4L, Some(4L), "b")).toDF("k", "v", "s")
    val r = OrderDetect.detect(df, "k", Seq("v", "s"), partitions = 2)
    assert(r("v").order == "ascending") // nulls skipped, 1 < 3 < 4
    assert(r("s").order == "random") // a < b < c > b
  }

  test("diff surfaces order and label drift") {
    import graft.profiler.{Diff, Profiler}
    val asc = (1 to 200).map(i => (i.toLong, s"u$i@example.com"))
      .toDF("v", "c").coalesce(1)
    val desc = (1 to 200).map(i => ((200 - i).toLong, s"$i"))
      .toDF("v", "c").coalesce(1)
    val d = Diff.diff(Profiler.profile(asc), Profiler.profile(desc))
    val vc = d.columns.find(_.name == "v").get
    assert(vc.orderChange.contains(("ascending", "descending")))
    val cc = d.columns.find(_.name == "c").get
    assert(cc.labelChange.exists { case (a, b) =>
      a == "EMAIL_ADDRESS" && b == "INTEGER" })
  }

  test("profile carries vocab, order, and datetime formats") {
    val df = (1 to 100).map(i =>
      (i.toLong, f"2023-06-${i % 28 + 1}%02d", "ab"))
      .toDF("k", "d", "s")
      .coalesce(1)
    val p = Profiler.profile(df)
    assert(p.column("s").get.text.get.vocabSize == 2)
    assert(p.column("s").get.text.get.vocab == Set("a", "b"))
    // vocab merges as a true set union
    val other = Profiler.profile(
      (1 to 10).map(i => (i.toLong, "2023-01-01", "bc")).toDF("k", "d", "s"))
    assert(p.merge(other).column("s").get.text.get.vocab == Set("a", "b", "c"))
    assert(p.column("k").get.order.contains("ascending"))
    assert(p.column("s").get.order.contains("constant"))
    assert(p.column("d").get.datetimeFormats.contains("yyyy-MM-dd"))
    assert(p.column("d").get.inferredType == "datetime")
    // string datetime columns get parsed min/max via discovered formats
    val dts = p.column("d").get.datetime.get
    assert(dts.minTs == "2023-06-01 00:00:00")
    assert(dts.maxTs == "2023-06-28 00:00:00")
    assert(dts.nDays >= 25 && dts.nDays <= 29) // HLL approx of 28
    val rep = profiler.Report.pretty(p)
    assert(rep.contains("\"vocab_size\"") && rep.contains("\"order\""))
  }

  test("ordinal day suffixes are stripped before format discovery") {
    import spark.implicits._
    import graft.functions.{cnt, DatetimeFormats}
    // reference strips 1st/2nd/3rd/..th before strptime probing
    // (datetime_column_profile.py:47-54)
    val cells = Seq("March 23rd, 2022", "July 01st, 2021", "May 02nd, 2020",
      "January 11th, 2019", "October 04th, 2018").toDF("c")
    val fmtB = DatetimeFormats.formats.find(_.strptime == "%B %d, %Y").get
    val n = cells.select(cnt(DatetimeFormats.matches(col("c"), fmtB)).as("n"))
      .head().getLong(0)
    // "May 02nd" strips to "May 02, 2020": 'May' fails the {3,8} full-month
    // shape (3-letter month belongs to %b) — 4 of 5 match %B
    assert(n == 4)
    // parsed() alone is lax (Java MMMM accepts 'May'); all 5 parse once
    // the suffix is stripped — the shape gate above is what narrows
    val parsed = cells
      .select(DatetimeFormats.parsed(col("c"), fmtB).cast("date").as("d"))
      .collect().map(r => Option(r.getDate(0)).map(_.toString))
    assert(parsed.count(_.isDefined) == 5)
    assert(parsed.flatten.contains("2022-03-23"))
    // no false strip on plain cells: digits not followed by a suffix
    assert(Seq("2022-03-04 12:30:45").toDF("c")
      .select(DatetimeFormats.stripDaySuffix(col("c")).as("s"))
      .head().getString(0) == "2022-03-04 12:30:45")
  }

  test("two-digit-year pivot: yy maps to 2000-2099 (Java reduced-value)") {
    import spark.implicits._
    import graft.functions.DatetimeFormats
    // DOCUMENTED DEVIATION from Python strptime's %y (69-99 → 1900s;
    // datetime_column_profile.py:25-42): Java's 'yy' is a reduced-value
    // field based at 2000, so ALL two-digit years land in 2000-2099.
    // This test pins the pivot so a silent behavior change is caught.
    val fmtYy = DatetimeFormats.formats.find(_.strptime == "%m/%d/%y").get
    val got = Seq("01/15/25", "01/15/69", "01/15/70", "01/15/99", "01/15/00")
      .toDF("c")
      .select(col("c"), DatetimeFormats.parsed(col("c"), fmtYy)
        .cast("date").cast("string").as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("01/15/25") == "2025-01-15")
    assert(got("01/15/69") == "2069-01-15")
    assert(got("01/15/70") == "2070-01-15")
    assert(got("01/15/99") == "2099-01-15")
    assert(got("01/15/00") == "2000-01-15")
  }

  test("robust_stats: an all-null column emits a null-stat row, not an " +
      "all-empty frame (regression); empty table stays empty") {
    import graft.operators.ColumnStatQueries
    val rows = (1 to 300).map { i =>
      (i.toDouble, (null: java.lang.Double), (i % 7).toDouble)
    }
    val df = rows.toDF("a", "b", "c")
    val out = ColumnStatQueries.robustStatsOf(spark, df, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c"))
    // the all-null column mirrors the DuckDB twin: null stats, 0 outliers
    val b = out("b")
    assert(b.isNullAt(1) && b.isNullAt(2) && b.isNullAt(3))
    assert(b.getLong(4) == 0L)
    assert(b.isNullAt(5) && b.isNullAt(6))
    // non-null columns carry real stats
    assert(!out("a").isNullAt(1) && !out("c").isNullAt(1))
    // 300 ints 1..300: q1=75.75, q3=225.25 (p·(n−1) interpolation)
    assert(math.abs(out("a").getDouble(1) - 75.75) < 1e-6)
    // ALL columns null on a non-empty table: three null-stat rows
    val allNull = Seq.fill(10)((null: java.lang.Double)).toDF("a")
      .select(col("a"), col("a").as("b"))
    val nn = ColumnStatQueries.robustStatsOf(spark, allNull, Seq("a", "b"))
      .collect()
    assert(nn.length == 2 && nn.forall(r => r.isNullAt(1) && r.getLong(4) == 0L))
    // empty table: zero rows (the twin's GROUP BY over zero rows)
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      df.schema)
    assert(ColumnStatQueries.robustStatsOf(spark, empty, Seq("a", "b", "c"))
      .collect().isEmpty)
  }

  test("approx twins track the exact bin_suggest / robust_stats closely") {
    val sf = SparkTestSession.sfDir
    // bin_suggest: same methods, each estimate within 2% or ±1 bin —
    // only scott/fd/auto read the (sketched) IQR, the rest are identical
    val exactB = SparkEntry.queries("bin_suggest")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val apxB = SparkEntry.benchOnly("bin_suggest_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exactB.keySet == apxB.keySet)
    exactB.foreach { case (m, b) =>
      val a = apxB(m)
      assert(math.abs(a - b) <= math.max(1L, (0.02 * b).toLong),
        s"$m: approx $a vs exact $b")
    }
    info(s"bin_suggest exact=$exactB approx=$apxB")
    // robust_stats: same rows; fences from the sketch keep outlier counts
    // and trimmed/winsorized means within 2% relative
    val exactR = SparkEntry.queries("robust_stats")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val apxR = SparkEntry.benchOnly("robust_stats_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exactR.keySet == apxR.keySet)
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 0.02 * (1 + math.abs(b))
    exactR.foreach { case (c, e) =>
      val a = apxR(c)
      assert(close(a.getAs[Double]("trimmed_mean"), e.getAs[Double]("trimmed_mean")), c)
      assert(close(a.getAs[Double]("winsor_mean"), e.getAs[Double]("winsor_mean")), c)
      val eo = e.getAs[Long]("n_outliers"); val ao = a.getAs[Long]("n_outliers")
      assert(math.abs(ao - eo) <= math.max(5L, (0.05 * eo).toLong),
        s"$c outliers: approx $ao vs exact $eo")
      info(s"robust_stats $c: outliers $eo->$ao, trim " +
        s"${e.getAs[Double]("trimmed_mean")}->${a.getAs[Double]("trimmed_mean")}, " +
        s"winsor ${e.getAs[Double]("winsor_mean")}->${a.getAs[Double]("winsor_mean")}")
    }
  }
}
