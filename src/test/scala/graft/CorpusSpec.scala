package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the corpus-curation operators (the oracle gates
  * value equality at two scale factors; these pin the structural
  * contracts on the smallest fixture so a regression fails fast and
  * locally). */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_perplexity: one row per language, positive finite scores") {
    val rows = SparkEntry.queries("text_perplexity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val langs = rows.map(_.getString(0))
    assert(langs.distinct.length == langs.length, "one row per language")
    rows.foreach { r =>
      val xent = r.getDouble(2)
      val ppl = r.getDouble(3)
      assert(xent > 0 && !xent.isInfinite, s"xent $xent must be positive finite")
      // ppl ≈ exp(xent), both rounded independently — loose sanity band
      assert(math.abs(ppl - math.exp(xent)) < 0.05 * ppl,
        s"ppl $ppl inconsistent with xent $xent")
      // add-one smoothing bounds ppl by vocabulary size from above
      assert(ppl >= 1.0)
    }
    // token mass across languages equals the corpus token count
    import org.apache.spark.sql.functions._
    val total = Tables.load(spark, sf, "documents")
      .select(size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("search_bm25: ranks are dense 1..k, scores non-increasing per query") {
    val rows = SparkEntry.queries("search_bm25")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (q, rs) =>
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to ranked.length).toSeq,
        s"$q ranks must be dense from 1")
      val scores = ranked.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$q scores must be non-increasing down the ranking")
      assert(scores.forall(_ > 0))
      val docs = ranked.map(_.getLong(2))
      assert(docs.distinct.length == docs.length, s"$q must not repeat a doc")
    }
  }

  test("budget_pack: per-source totals respect the budget and admit greedily") {
    val rows = SparkEntry.queries("budget_pack")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= 600L,
        s"source ${r.getString(0)} packed ${r.getLong(2)} tokens over budget")
      assert(r.getLong(1) > 0)
    }
  }

  test("mix_sources: targets honor the weight ratios and never exceed supply") {
    val rows = SparkEntry.queries("mix_sources")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (lang, (total, target, chars)) =>
      assert(target <= total, s"$lang target $target exceeds supply $total")
      assert(chars > 0, s"$lang selection must admit documents")
    }
    // the binding language is sampled at (nearly) full supply: T =
    // min(count/w) means some language's floor(w*T) is within 1 of count
    assert(rows.exists { case (_, (total, target, _)) => total - target <= 1 },
      "at least one language must be the binding constraint")
  }
}
