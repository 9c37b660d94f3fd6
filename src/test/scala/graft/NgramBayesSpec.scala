package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.labelers.NgramBayes

/** NgramBayes unit tests: the trainable char-n-gram NB model (the
  * reference's char-CNN slot, character_level_cnn_model.py:28-644,
  * re-expressed) — fit/predict determinism, the short-cell guard, and
  * the Column-algebra `asModel` plug agreeing with `predict`. */
class NgramBayesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def trainDf = {
    import spark.implicits._
    Seq.tabulate(50) { i =>
      Seq(
        ("EMAIL", s"user$i@example.com"),
        ("IPV4", s"10.${i % 250}.${(i * 7) % 250}.${i % 100 + 1}"),
        ("PHONE", f"(${i % 700 + 200}%03d) ${i % 900 + 100}%03d-${i % 10000}%04d"))
    }.flatten.toDF("label", "cell")
  }

  test("fit + predict recovers the generating label on held-out cells") {
    import spark.implicits._
    val model = NgramBayes.fit(trainDf)
    // held-out cells from the SAME generating distributions (unseen ids;
    // NB generalizes within-distribution, not to unseen domains)
    val test = Seq(
      (1L, "user777@example.com", "EMAIL"),
      (2L, "10.93.211.54", "IPV4"),
      (3L, "(303) 555-0142", "PHONE")).toDF("id", "cell", "want")
    val got = NgramBayes.predict(test.select("id", "cell"), model)
      .join(test, Seq("id")).select("want", "pred").collect()
    assert(got.forall(r => r.getString(0) == r.getString(1)),
      got.mkString(","))
  }

  test("cells shorter than N produce zero grams and a deterministic pred") {
    import spark.implicits._
    val model = NgramBayes.fit(trainDf)
    val out = NgramBayes.predict(Seq((1L, "ab")).toDF("id", "cell"), model)
      .collect()
    // no grams → every label scores its prior; tie breaks label-ASC
    assert(out.length == 1 && out(0).getString(1) == "EMAIL")
  }

  test("a label whose every training cell is shorter than N is dropped") {
    // gram-free labels must vanish from the model (not crash fit, not
    // score at predict): the sentinel-row fit counts their docs but
    // contributes no grams, matching the old join-drop semantics
    import spark.implicits._
    val model = NgramBayes.fit(
      trainDf.unionAll(Seq(("TINY", "ab"), ("TINY", "x")).toDF("label", "cell")))
    val labels = model.labelStats.select("label").collect().map(_.getString(0))
    assert(!labels.contains("TINY") && labels.length == 3)
    assert(model.gramLogp.filter(col("label") === "TINY").count() == 0)
  }

  test("asModel Column scoring agrees with the broadcast-join route") {
    import spark.implicits._
    val model = NgramBayes.fit(trainDf)
    val cells = Seq(
      (1L, "bob@host.net"), (2L, "192.168.1.77"), (3L, "(415) 867-5309"),
      (4L, "xy")).toDF("id", "cell")
    // predictJoin explicitly: predict() itself routes small models to
    // the Column path, which would compare asModel against itself
    val viaDf = NgramBayes.predictJoin(cells, model).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lm = NgramBayes.asModel(model)
    val viaCol = cells.select(col("id"), lm.label(col("cell")).as("pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaDf == viaCol)
    val viaPredict = NgramBayes.predict(cells, model).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaPredict == viaDf, "adaptive route diverged from join route")
  }

  test("label_agreement/labeler_nb entity model routes one-exchange (fan-out gate)") {
    import spark.implicits._
    // the r16 fan-out gate, pinned on the ACTUAL production model of
    // the label_agreement/labeler_nb queries: shape-normalized entity
    // grams have fan-out ~1-3 over ≤19 labels, so the gate must choose
    // the conditional one-exchange form — and its physical plan must
    // carry exactly ONE shuffle (the groupBy(id); the argmax reuses
    // that partitioning). The langid regime (fan-out ≈ |labels|) is the
    // measured counter-case and must stay shuffled.
    val o = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val model = NgramBayes.fit(graft.operators.LabelerQueries.nbTrain(o))
    assert(NgramBayes.conditionalForm(model),
      "entity model fell to the shuffled form; label_agreement would " +
        "pay the extra exchanges")
    val docs = Seq.tabulate(64)(i => (i.toLong, s"^user$i@ex.org$$"))
      .toDF("id", "cell")
    val pred = NgramBayes.predict(docs, model)
    pred.collect() // finalize AQE so the stages below are the real ones
    // count ShuffleExchange NODES by traversal, descending through the
    // AQE wrappers (TreeNode.collect stops at AdaptiveSparkPlanExec /
    // QueryStageExec boundaries, and the plan STRING is brittle against
    // Spark formatting — r17 advice). ReusedExchangeExec is a leaf
    // reference, so a reused shuffle is correctly counted once.
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val self = if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(shuffles).sum
    }
    val exchanges = shuffles(pred.queryExecution.executedPlan)
    assert(exchanges == 1,
      s"expected exactly 1 shuffle exchange in the conditional predict " +
        s"plan, got $exchanges:\n${pred.queryExecution.executedPlan}")
  }
}
