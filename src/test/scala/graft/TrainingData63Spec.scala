package graft

import org.apache.spark.sql.functions._
import graft.operators.{TrainingData54, TrainingData55, TrainingData63}

/** The recall contract of two-tier exact-substring dedup: no shared
  * span is dropped at ANY document frequency — the pair tier covers
  * df ∈ [2, cap] exactly, the linear high-df tier covers df > cap,
  * and the merged scrub ledger is invariant to where the cap sits.
  * This pins the round-10 verdict's "silent-recall hole": before the
  * high-df tier, a span duplicated past the fixed cap (the realistic
  * Common-Crawl shape the Lee-et-al scrub exists for) vanished. */
class TrainingData63Spec extends SparkTestBase {

  private def doc(id: Long, toks: Seq[String]): (Long, String) =
    (id, toks.mkString(" "))

  test("planted 200x-duplicated span: recovered by the high-df tier at the production cap") {
    import spark.implicits._
    val span = (1 to 30).map(i => s"dup$i")
    // 200 copies (df = 200 >> SubstrMaxDf = 64) behind per-doc-unique
    // filler, plus 50 span-free docs
    val planted = (1L to 200L).map(id =>
      doc(id, (1 to 6).map(i => s"f${id}_$i") ++ span ++
        (7 to 12).map(i => s"f${id}_$i")))
    val clean = (201L to 250L).map(id =>
      doc(id, (1 to 40).map(i => s"c${id}_$i")))
    val docs = (planted ++ clean).toDF("doc_id", "text")
    val cap = TrainingData54.SubstrMaxDf

    // the pair tier alone is BLIND to the span (df 200 > cap) — the
    // round-10 hole, kept as a documented contract of that tier
    assert(TrainingData54.exactSubstringOf(docs, 10, cap).count() == 0L)
    assert(TrainingData55.substringScrubOf(docs, 10, cap).count() == 0L)

    // the high-df tier sees it in EVERY copy with the exact length:
    // 21 anchors (30 − 10 + 1), all df = 200, one island per doc
    val islands = TrainingData63.highDfIslandsOf(docs, 10, cap).collect()
    assert(islands.length == 200)
    islands.foreach { r =>
      assert(r.getAs[Long]("span_start") == 7L) // after 6 filler tokens
      assert(r.getAs[Long]("span_tokens") == 30L)
      assert(r.getAs[Long]("min_gram_df") == 200L)
    }

    // the full scrub removes the span from all but the canonical
    // min-doc copy: 199 ledger rows, one 30-token interval each
    val ledger = TrainingData63.fullSubstringScrubOf(docs, 10, cap).collect()
    assert(ledger.length == 199)
    assert(ledger.map(_.getAs[Long]("doc_id")).toSet == (2L to 200L).toSet)
    ledger.foreach { r =>
      assert(r.getAs[Long]("tokens_removed") == 30L)
      assert(r.getAs[Long]("n_intervals") == 1L)
      assert(r.getAs[Long]("n_tokens") == 42L)
    }
  }

  test("merged scrub ledger is cap-invariant on a mixed-df corpus") {
    import spark.implicits._
    val span = (1 to 17).map(i => s"s$i")
    // messy shape: full/partial overlaps (per-gram df varies 2..3),
    // a 6-doc boilerplate header, and unique docs
    val header = (1 to 12).map(i => s"h$i")
    val docs = (Seq(
      doc(1L, (1 to 5).map(i => s"u$i") ++ span ++ (6 to 10).map(i => s"u$i")),
      doc(2L, (1 to 4).map(i => s"v$i") ++ span ++ (5 to 9).map(i => s"v$i")),
      doc(3L, (1 to 6).map(i => s"x$i") ++ span.take(11) ++
        (7 to 12).map(i => s"x$i")),
      doc(4L, (1 to 3).map(i => s"y$i") ++ span.drop(6) ++
        (4 to 9).map(i => s"y$i"))) ++
      (10L to 15L).map(id =>
        doc(id, header ++ (1 to 15).map(i => s"w${id}_$i"))) ++
      (20L to 22L).map(id =>
        doc(id, (1 to 25).map(i => s"q${id}_$i"))))
      .toDF("doc_id", "text")
    def run(cap: Int): Seq[(Long, Long, Long, Long)] =
      TrainingData63.fullSubstringScrubOf(docs, 10, cap).collect().toSeq
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("tokens_removed"), r.getAs[Long]("n_intervals")))
    val low = run(2)        // nearly everything routes high-df
    val high = run(999)     // everything routes through the pair tier
    val mid = run(TrainingData54.SubstrMaxDf)
    assert(low.nonEmpty && low == high && low == mid,
      s"ledger must not depend on the tier split:\nlow=$low\nhigh=$high")
    // and the ledger covers every doc with an earlier-shared span:
    // 2,3,4 share with doc 1; headers 11..15 share with doc 10
    assert(low.map(_._1).toSet == Set(2L, 3L, 4L) ++ (11L to 15L).toSet)
  }

  test("high-df islands: separate spans stay separate islands with exact bounds") {
    import spark.implicits._
    val a = (1 to 12).map(i => s"a$i")
    val b = (1 to 10).map(i => s"b$i")
    // both spans in 4 docs (df = 4 > cap 2), split by unique middles;
    // doc 1 carries them at known offsets
    val docs = (1L to 4L).map(id =>
      doc(id, a ++ (1 to 5).map(i => s"m${id}_$i") ++ b ++
        Seq(s"t${id}_1", s"t${id}_2")))
      .toDF("doc_id", "text")
    val out = TrainingData63.highDfIslandsOf(docs, 10, 2)
      .filter(col("doc_id") === 1L).collect()
      .map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_tokens"),
        r.getAs[Long]("min_gram_df")))
    // span a: anchors at pos 1..3 (12 − 10 + 1), span 12 from pos 1;
    // span b: its single anchor at pos 18 (after 12 + 5 tokens)
    assert(out.toSet == Set((1L, 12L, 4L), (18L, 10L, 4L)))
  }
}
