package graft.labelers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The labeler PIPELINE boundary (reference DataLabeler factory,
  * base_data_labeler.py:23-449: preprocessor → model → postprocessor),
  * so the regex model is one plug among possible others (a broadcast
  * ONNX char-CNN scoring inside `mapPartitions` would implement
  * [[LabelModel]] without touching callers).
  *
  * All three stages stay in the Column algebra where possible: the
  * preprocessor and the regex model are codegen'd expressions; only the
  * vote decision is driver math over the (columns × 24) vote table.
  */
object DataLabeler {

  /** Cell normalization before the model sees it. */
  trait CellPreprocessor extends Serializable {
    def prepare(c: Column): Column
  }

  /** Cell → label column (null in, null out; UNKNOWN for no match). */
  trait LabelModel extends Serializable {
    def label(c: Column): Column
  }

  /** Vote table → final column label. */
  trait VotePostprocessor extends Serializable {
    def decide(votes: Map[String, Long]): String
  }

  object TrimPreprocessor extends CellPreprocessor {
    def prepare(c: Column): Column = trim(c)
  }

  object RegexModel extends LabelModel {
    def label(c: Column): Column = RegexLabeler.labelOf(c)
  }

  /** Two-stage structured model: the anchored whole-cell chain, with the
    * token-window scan fallback when (only when) the chain says UNKNOWN.
    * Identical to [[RegexModel]] on every cell the chain labels — so the
    * clean-corpus vote tables are unchanged — while prose-embedded and
    * punctuation-noised entities recover through the scan
    * (LABELER_ACCURACY.md's adversarial table quantifies the gap this
    * closes). */
  object TwoStageModel extends LabelModel {
    def label(c: Column): Column = {
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .foreach(FastLabelTwoStage.register)
      FastLabelTwoStage(c)
    }
  }

  object ThresholdVote extends VotePostprocessor {
    def decide(votes: Map[String, Long]): String = RegexLabeler.decide(votes)
  }

  final class Pipeline(
      pre: CellPreprocessor, model: LabelModel, post: VotePostprocessor)
      extends Serializable {

    /** Label every cell of `colName` and return the vote table. */
    def votes(df: DataFrame, colName: String): Map[String, Long] =
      df.select(model.label(pre.prepare(col(colName))).as("label"))
        .filter(col("label").isNotNull)
        .groupBy("label").agg(count(lit(1)).as("c"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    def labelColumn(df: DataFrame, colName: String): String =
      post.decide(votes(df, colName))
  }

  /** The structured default: trim → two-stage 24-label model (whole-cell
    * chain, scan fallback on UNKNOWN) → 0.35/0.2 threshold vote (what
    * the profiler's label pass applies). [[RegexModel]] remains the
    * pure-chain plug for callers that want the reference's anchored
    * behavior only. */
  val structuredDefault: Pipeline =
    new Pipeline(TrimPreprocessor, TwoStageModel, ThresholdVote)
}
