package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.profiler.{Profiler, ProfilerOptions}

/** Isolated A/B for the `profile_gate` r18 sf1 regression (7.8 →
  * 11.0 s in the committed window — r18 verdict what's-wrong #1): the
  * d9eb161 change added two degenerate FIXTURE columns (l_zero,
  * l_shift) to the profiled snapshot, growing the profiled column set
  * 3 → 5, so part of the delta is deliberate oracle-coverage cost
  * riding the per-column job floor of the profileSplit composite and
  * part is window tax. This tool times BOTH shapes warm in one JVM
  * (plus the gate driver math) with a job census, so the split is a
  * measurement, not an attribution guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=4
  *        runMain graft.tools.GateAb
  */
object GateAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    })
    val cutoff = "1998-06-01"
    val li = Tables.load(spark, dir, "lineitem")
    li.count() // warm the scan

    def base(fixtures: Boolean): DataFrame = {
      val core = li.select(col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"),
        (to_date(col("l_shipdate")) >= lit(cutoff)).cast("long").as("__half"))
      if (!fixtures) core
      else li.select(col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"),
        lit(0.0).as("l_zero"),
        when(to_date(col("l_shipdate")) >= lit(cutoff), lit(500.0))
          .otherwise(lit(5.0)).as("l_shift"),
        (to_date(col("l_shipdate")) >= lit(cutoff)).cast("long").as("__half"))
    }
    val opts = ProfilerOptions(computeCorrelation = false,
      computeLabels = false, computeOrder = false,
      computeHistograms = false)

    def run(fixtures: Boolean): (Double, Int) = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val b = base(fixtures)
      val split = Profiler.profileSplit(b, "__half", opts)
      graft.profiler.Gate.check(split(0L), split(1L))
      ((System.nanoTime() - t0) / 1e9, jobs - j0)
    }

    run(fixtures = true) // warm (JIT + codegen caches)
    (1 to 3).foreach { rep =>
      val (tPre, jPre) = run(fixtures = false)
      val (tFix, jFix) = run(fixtures = true)
      println(f"""{"metric":"gate_ab","rep":$rep,""" +
        f""""pre_r18_3col_sec":$tPre%.3f,"pre_r18_jobs":$jPre,""" +
        f""""r18_5col_sec":$tFix%.3f,"r18_jobs":$jFix,""" +
        f""""fixture_cost_sec":${tFix - tPre}%.3f,"cpus":$cpus,"sf":"$dir"}""")
    }
    spark.stop()
  }
}
