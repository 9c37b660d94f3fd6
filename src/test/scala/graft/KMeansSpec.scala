package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KMeansIvf

/** Lloyd IVF fit: must recover planted clusters and beat the naive
  * first-k init on compactness. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // three planted directions in 4-dim, 30 points each with deterministic
  // small perturbations; first-k init (k=3) starts inside ONE cluster
  private def data = {
    val dirs = Seq(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    (0 until 90).map { i =>
      val d = dirs(i / 30)
      val eps = 0.05 * ((i * 7919) % 11 - 5) / 5.0
      val v = d.zipWithIndex.map { case (x, j) =>
        x + (if (j == 3) eps else 0.0)
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "v")
  }

  test("fit separates planted clusters and improves compactness") {
    val naive = data.orderBy("vec_id").limit(3)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val fitted = KMeansIvf.fit(data, "vec_id", "v", k = 3, iters = 5)
    val before = KMeansIvf.compactness(data, "v", naive)
    val after = KMeansIvf.compactness(data, "v", fitted)
    assert(after > before + 0.1,
      s"compactness should improve: $before -> $after")
    // each planted cluster maps to exactly one cell
    val cells = KMeansIvf.assign(data, "v", fitted)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val byCluster = cells.groupBy { case (id, _) => id / 30 }
    byCluster.values.foreach { members =>
      assert(members.map(_._2).distinct.length == 1)
    }
    assert(cells.map(_._2).distinct.length == 3)
  }
}
