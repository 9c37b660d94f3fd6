package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The canonical library install point: register every graft custom
  * Catalyst expression in a session at BUILD time —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or: SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * — so `graft_dot`, `graft_minhash_{md5,xx}`, `graft_redact_scan`,
  * `graft_label`, and `graft_md5ab` resolve in plain SQL on every
  * session (including `newSession()` clones) without any per-session
  * `register(spark)` call. The per-object `register` helpers remain for
  * ad-hoc sessions; this class is the zero-code path a cluster deploy
  * would configure once.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        ""),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn(functions.L2Sq.FuncName,
      "_FUNC_(a, b) - squared L2 distance of two double arrays",
      exprs => functions.L2Sq(exprs(0), exprs(1))))
    ext.injectFunction(fn(functions.DotProduct.FuncName,
      "_FUNC_(a, b) - dot product of two array<double> vectors",
      exprs => functions.DotProduct(exprs(0), exprs(1))))
    ext.injectFunction(fn(functions.Md5AB.FuncName,
      "_FUNC_(s) - first/second 32-bit words of md5(s) as array<bigint>",
      exprs => functions.Md5AB(exprs.head)))
    ext.injectFunction(fn(functions.MinHashSig.FuncName + "_md5",
      "_FUNC_(text) - md5-family MinHash signature of a document",
      exprs => functions.MinHashSig(exprs.head, md5 = true)))
    ext.injectFunction(fn(functions.MinHashSig.FuncName + "_xx",
      "_FUNC_(text) - xxhash64-family MinHash signature of a document",
      exprs => functions.MinHashSig(exprs.head, md5 = false)))
    ext.injectFunction(fn(functions.RedactScan.FuncName,
      "_FUNC_(text) - single-pass PII counts + redacted length",
      exprs => functions.RedactScan(exprs.head)))
    ext.injectFunction(fn(labelers.FastLabel.FuncName,
      "_FUNC_(cell) - entity label via the FastMatch decision procedure",
      exprs => labelers.FastLabel(exprs.head)))
    ext.injectFunction(fn(functions.NfcNormalize.FuncName,
      "_FUNC_(s) - Unicode NFC normalization",
      exprs => functions.NfcNormalize(exprs.head)))
    ext.injectFunction(fn(functions.BloomMembership.AggName,
      "_FUNC_(hash, nItems, nBits) - Bloom sketch of a hashed-long set",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(fn(functions.BloomMembership.ProbeName,
      "_FUNC_(sketch, hash) - map-side Bloom membership probe",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))))
    ext.injectFunction(fn(functions.IntersectCount.FuncName,
      "_FUNC_(a, b) - |a ∩ b| of two sorted int/long arrays",
      functions.IntersectCount.builder))
    ext.injectFunction(fn(functions.GramRepetition.FuncName,
      "_FUNC_(words) - [n_grams, top_gram_count, dup_gram_count] of word 2-grams",
      functions.GramRepetition.builder))
    ext.injectFunction(fn(functions.WordGrams.FuncName,
      "_FUNC_(words|text, n, stride, dedup) - word n-grams / chunks in one pass",
      functions.WordGrams.builder))
    ext.injectFunction(fn(functions.CharGrams.FuncName,
      "_FUNC_(s, n) - all overlapping character n-grams",
      functions.CharGrams.builder))
    ext.injectFunction(fn(functions.CharEntropy.FuncName,
      "_FUNC_(s) - Shannon entropy (bits/char) of the codepoint distribution",
      functions.CharEntropy.builder))
    ext.injectFunction(fn(functions.CollectSortedInts.FuncName,
      "_FUNC_(v) - distinct sorted array<int> aggregate (primitive buffers)",
      functions.CollectSortedInts.builder))
    ext.injectFunction(fn(labelers.FastLabelTwoStage.FuncName,
      "_FUNC_(cell) - two-stage entity label (chain, normalize, scan)",
      exprs => labelers.FastLabelTwoStage(exprs.head)))
    ext.injectFunction(fn(functions.TermCounts.FuncName,
      "_FUNC_(text, 'terms,csv') - per-term frequencies + total token count",
      functions.TermCounts.builder))
    ext.injectFunction(fn(functions.BucketSum.FuncName,
      "_FUNC_(bs, 'longs,csv') - gather-add of a long table over bucket ids",
      functions.BucketSum.builder))
    ext.injectFunction(fn(functions.AdcLut.FuncName,
      "_FUNC_(codes, 'doubles,csv') - PQ ADC lookup-table gather-sum",
      functions.AdcLut.builder))
    ext.injectFunction(fn(functions.LangScores.FuncName,
      "_FUNC_(text, 'lang:w1,w2;...') - all language-profile scores in one scan",
      functions.LangScores.builder))
    ext.injectFunction(fn(functions.HashBuckets.FuncName,
      "_FUNC_(text, nb, asSet) - md5 token buckets: count vector or distinct set",
      functions.HashBuckets.builder))
    ext.injectFunction(fn(functions.DateShapeMask.FuncName,
      "_FUNC_(cell) - 16-bit datetime shape-match mask (suffix-stripped)",
      functions.DateShapeMask.builder))
  }
}
