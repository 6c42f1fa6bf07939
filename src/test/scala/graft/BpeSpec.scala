package graft

import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Distributed BPE trainer vs an independent single-node reference: the
  * merge list must be IDENTICAL (the determinism contract that lets a
  * tokenizer trained on a 1000-executor cluster be reproduced anywhere). */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Single-node reference trainer — hash-map pair counting over the
    * collected word-frequency table, same total tie-break order. */
  private def refTrain(wordFreq: Seq[(String, Long)], numMerges: Int,
      minFreq: Long): Seq[(String, String, Long)] = {
    var vocab = wordFreq.map { case (w, f) =>
      (w.toList.map(_.toString) :+ Bpe.Marker, f)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (!done && merges.size < numMerges) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; p <- syms.sliding(2) if p.size == 2)
        counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) =
          counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minFreq) done = true
        else {
          merges += ((l, r, c))
          vocab = vocab.map { case (s, f) => (Bpe.applyMerge(s, l, r), f) }
        }
      }
    }
    merges.toSeq
  }

  test("distributed training equals the single-node reference exactly") {
    val wf = Bpe.wordFreqOf(spark.read.parquet(s"$sf/documents.parquet"))
    val local = wf.as[(String, Long)].collect().toSeq
    val expected = refTrain(local, numMerges = 30, minFreq = 2L)
    val got = Bpe.train(wf, numMerges = 30)
      .map(m => (m.left, m.right, m.pair_freq))
    assert(got == expected)
    assert(got.size == 30) // the corpus supports a full 30 merges
  }

  test("greedy scan-merge semantics: overlapping pairs merge left-to-right") {
    assert(Bpe.applyMerge(List("a", "a", "a"), "a", "a") == List("aa", "a"))
    assert(Bpe.applyMerge(List("a", "a", "a", "a"), "a", "a") ==
      List("aa", "aa"))
    assert(Bpe.applyMerge(List("x", "a", "b", "b"), "a", "b") ==
      List("x", "ab", "b"))
  }

  test("segmentation reconstructs every training word") {
    val wf = Bpe.wordFreqOf(spark.read.parquet(s"$sf/documents.parquet"))
    val merges = Bpe.train(wf, numMerges = 30).map(m => (m.left, m.right))
    val words = wf.select("word").as[String].collect()
    for (w <- words) {
      val pieces = Bpe.segment(w, merges)
      assert(pieces.mkString == w + Bpe.Marker, s"word $w -> $pieces")
      assert(pieces.nonEmpty && pieces.size <= w.length + 1)
    }
    // frequent words compress: at least one training word segments to
    // fewer pieces than characters
    assert(words.exists(w => Bpe.segment(w, merges).size < w.length + 1))
  }

  test("merge-list persistence round-trips in training order") {
    val wf = Bpe.wordFreqOf(spark.read.parquet(s"$sf/documents.parquet"))
    val merges = Bpe.train(wf, numMerges = 12)
    val dir = tmpDir("bpe-merges")
    Bpe.writeMerges(spark, merges, dir)
    assert(Bpe.readMerges(spark, dir) == merges)
    // segmenting against the loaded artifact == segmenting live — the
    // train-once / apply-nightly contract
    val pairs = merges.map(m => (m.left, m.right))
    val loaded = Bpe.readMerges(spark, dir).map(m => (m.left, m.right))
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
    assert(Bpe.segmentWith(docs, loaded).collect().toSeq ==
      Bpe.segmentWith(docs, pairs).collect().toSeq)
  }

  test("t25 counts match local segmentation on a sample of documents") {
    val merges = Bpe.train(
      Bpe.wordFreqOf(spark.read.parquet(s"$sf/documents.parquet")),
      numMerges = 30).map(m => (m.left, m.right))
    val got = Bpe.t25BpeSegment(spark, sf).limit(20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .where(col("doc_id").isin(got.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, txt) <- docs) {
      val exp = txt.split("\\s+").iterator
        .map(w => Bpe.segment(w, merges).size.toLong).sum
      assert(got(id) == exp, s"doc $id")
    }
  }

  test("oracle precondition: no document token carries the U+001F symbol separator") {
    // the t25 DuckDB oracle encodes every whitespace token's symbols as a
    // chr(31)-wrapped string (training tokens are ^[a-z]+$-safe, but
    // SEGMENTATION touches every token); a corpus token containing the
    // separator itself would mis-parse oracle-side and read as a false
    // cross-engine mismatch. The fixture generator is ASCII-printable —
    // pin that assumption where the oracle depends on it.
    assert(graft.sources.Tables.t(spark, sf, "documents")
      .where(col("text").contains("\u001f")).isEmpty,
      "documents.text contains U+001F — the BPE oracle's symbol " +
        "separator; re-encode the oracle before trusting t25's gate")
  }
}
