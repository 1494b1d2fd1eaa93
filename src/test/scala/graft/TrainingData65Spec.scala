package graft

import org.apache.spark.sql.functions._
import graft.operators.{TrainingData4, TrainingData65}

/** Recall contract of two-tier decontamination: the leakage matrix
  * is invariant to where the df cap sits (the cap is a work split,
  * not a recall knob), and a mass-duplicated leaked passage — the
  * shape the capped matrix silently dropped — is counted in full. */
class TrainingData65Spec extends SparkTestBase {

  // split assignment is md5(doc_id)-nibble; find ids per split so
  // fixtures can plant leaks deterministically
  private def splitOf(id: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val nib = "%02x".format(h(0)).charAt(0)
    if (nib == 'c' || nib == 'd') "val"
    else if (nib == 'e' || nib == 'f') "test" else "train"
  }

  test("planted 200x-duplicated eval leak: counted in full at the production cap") {
    import spark.implicits._
    val leak = (1 to 13).map(i => s"leak$i").mkString(" ")
    val ids = (1L to 4000L)
    val trainIds = ids.filter(splitOf(_) == "train").take(200)
    val valId = ids.find(splitOf(_) == "val").get
    // the leaked passage sits in 200 train docs AND one val doc
    // (df = 201 >> ContaminationMaxDf = 64); filler is per-doc unique
    val docs = (trainIds.map(id =>
      (id, s"$leak f${id}_a f${id}_b f${id}_c")) :+
      ((valId, s"$leak g_a g_b g_c"))).toDF("doc_id", "text")
    val cap = TrainingData4.ContaminationMaxDf

    // the capped pair-tier matrix is blind to it (the round-10-class
    // hole, demonstrated): df 201 > 64 drops the gram entirely
    assert(TrainingData4.splitContaminationOf(docs, cap).count() == 0)

    // the two-tier matrix reports every leaky doc in both directions
    val full = TrainingData65.contaminationFullOf(docs, cap).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_leaky_docs"), r.getAs[Long]("n_shared_grams"))).toMap
    assert(full(("val", "train")) == (200L, 1L))   // 200 contaminated train docs
    assert(full(("train", "val")) == (1L, 1L))     // the leaked eval doc
    // cross-split pairs only: intra-train duplication is dedup's
    // jurisdiction, not the leakage matrix's
    assert(full.size == 2)
  }

  test("leakage matrix is cap-invariant on the corpus (tiers must agree with the ideal join)") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    def m(cap: Int) = TrainingData65.contaminationFullOf(docs, cap)
      .collect().map(_.toSeq).toSeq
    val lo = m(2)     // corpus max 13-gram df is small: most routes high-df
    val hi = m(9999)  // everything routes through the pair tier
    assert(lo.nonEmpty && lo == hi,
      s"cap must be a pure work split:\nlo=$lo\nhi=$hi")
  }
}
