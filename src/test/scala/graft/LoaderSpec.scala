package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the training-loader operators (the oracle gates
  * value equality at two scale factors; these pin the closed-form
  * arithmetic and selection contracts on the smallest fixture). */
class LoaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("chunk_overlap closed forms: coverage, overlap bound, tail logic") {
    val rows = SparkEntry.queries("chunk_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nTokens, nChunks, chunkToks, dupToks, nTail) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      // every token is covered at least once, duplicated tokens are the
      // exact difference, and a doc contributes at least one chunk
      assert(chunkToks == nTokens + dupToks)
      assert(nChunks >= nDocs)
      // overlap per extra chunk is exactly ChunkLen - ChunkStride = 8
      assert(dupToks == (nChunks - nDocs) * 8,
        s"overlap must be (chunks - docs) * (C - S): $r")
      assert(nTail <= nDocs)
    }
  }

  test("sample_weighted keeps at most K per source and is weight-skewed") {
    val rows = SparkEntry.queries("sample_weighted")(spark, sf).collect()
    assert(rows.nonEmpty)
    var keptChars = 0L; var keptN = 0L; var totChars = 0L; var totN = 0L
    rows.foreach { r =>
      val (nTotal, charsTotal, nKept, charsKept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nKept == math.min(10L, nTotal))
      assert(charsKept <= charsTotal)
      assert(!r.isNullAt(5) && r.getDouble(5) > 0.0)
      keptChars += charsKept; keptN += nKept
      totChars += charsTotal; totN += nTotal
    }
    // priority u/w favors large w: kept docs average longer than corpus
    assert(keptChars.toDouble / keptN > totChars.toDouble / totN,
      "weighted sample must skew toward long documents")
  }

  test("batch_pack: batch count closed form, single-batch determinism") {
    val rows = SparkEntry.queries("batch_pack")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nBatches, padSorted, padNaive) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nBatches == (nDocs + 15) / 16, s"n_batches != ceil(n/B): $r")
      assert(padSorted >= 0 && padNaive >= 0)
      // a single (ragged) batch holds the whole shard under BOTH
      // orderings — identical membership must give identical waste
      if (nBatches == 1) assert(padSorted == padNaive, s"1-batch shard: $r")
      // sorted-contiguous provably minimizes Σ max over full batches;
      // with the ragged tail it can only lose by less than one batch's
      // spread — pin the sane bound rather than an unsound sign claim
      if (nDocs % 16 == 0) assert(padSorted <= padNaive, s"full-batch: $r")
    }
  }
}
