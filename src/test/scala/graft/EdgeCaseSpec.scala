package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.profiler.{Codec, Diff, Profiler, Report}

/** Degenerate inputs must profile, report, encode, and merge without
  * crashing: empty frames, single rows, all-null columns. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("num", DoubleType, nullable = true),
    StructField("str", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  private def df(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size)),
      schema)

  test("roundHalfUp passes NaN/Inf through like Spark round()") {
    // degenerate census slices (n == 0, pe == 1.0) produce NaN/Inf
    // ratios; driver-side rounding must yield NaN rows like the old
    // DataFrame round() did, not throw NumberFormatException
    import graft.functions.roundHalfUp
    assert(roundHalfUp(Double.NaN, 6).isNaN)
    assert(roundHalfUp(Double.PositiveInfinity, 6).isPosInfinity)
    assert(roundHalfUp(Double.NegativeInfinity, 6).isNegInfinity)
    assert(roundHalfUp(0.0000005, 6) == 1e-6) // HALF_UP on the knife edge
    assert(roundHalfUp(-1.2345675, 6) == -1.234568)
  }

  test("empty DataFrame profiles and reports") {
    val p = Profiler.profile(df())
    assert(p.rowCount == 0)
    assert(p.columns.size == 3)
    val json = Report.pretty(p)
    assert(json.contains("\"row_count\": 0"))
    assert(Codec.encode(Codec.decode(Codec.encode(p))) == Codec.encode(p))
    // merging two empties stays empty
    assert(p.merge(p).rowCount == 0)
  }

  test("single-row DataFrame profiles; stats degenerate gracefully") {
    val t = java.sql.Timestamp.valueOf("2026-01-02 03:04:05")
    val p = Profiler.profile(df(Row(4.5, "x", t)))
    assert(p.rowCount == 1)
    val n = p.column("num").get.numeric.get
    assert(n.mean == 4.5 && n.min == 4.5 && n.max == 4.5)
    assert(n.varianceSample.isNaN) // n=1: undefined, not crash
    assert(p.column("str").get.categorical.get.counts == Map("x" -> 1L))
    Report.pretty(p)
  }

  test("all-null column profiles and merges") {
    val rows = (1 to 10).map(_ => Row(null, null, null))
    val p = Profiler.profile(df(rows: _*))
    assert(p.rowCount == 10)
    assert(p.column("num").get.nulls == 10)
    assert(p.rowIsNull == 10 && p.rowHasNull == 10)
    val merged = p.merge(p)
    assert(merged.column("num").get.nulls == 20)
    val d = Diff.diff(p, p)
    assert(d.rowCountDelta == 0)
    Report.pretty(merged)
  }

  test("mixed: some nulls in every column") {
    val t = java.sql.Timestamp.valueOf("2026-01-02 03:04:05")
    val rows = (1 to 20).map { i =>
      Row(if (i % 3 == 0) null else i.toDouble,
        if (i % 4 == 0) null else s"v$i",
        if (i % 5 == 0) null else t)
    }
    val p = Profiler.profile(df(rows: _*))
    assert(p.column("num").get.nulls == 6)
    assert(p.column("str").get.nulls == 5)
    assert(p.column("ts").get.nulls == 4)
    assert(p.rowIsNull == 0) // lcm(3,4,5)=60 > 20: no all-null row
    assert(p.rowHasNull == (1 to 20).count(i =>
      i % 3 == 0 || i % 4 == 0 || i % 5 == 0))
  }
}
