package graft

import org.apache.spark.sql.functions._

import graft.plans.HashExpressions

/** Winnowing fingerprint (plans.WinnowFingerprint): codegen vs
  * interpreted equivalence against an independent Scala reference,
  * the MOSS detection guarantee, and the short-input edges.
  */
class WinnowSpec extends SparkTestBase {
  private val P = 1000000007L

  /** Independent reference implementation (idiomatic collections,
    * shares no code with the expression's primitive loops). */
  private def ref(s: String, k: Int, w: Int): Seq[Long] = {
    val cs = s.getBytes("UTF-8").map(b => (b & 0xff).toLong).toSeq
    val kh =
      if (cs.isEmpty) Seq(0L)
      else if (cs.length < k) Seq(cs.tail.foldLeft(cs.head)((a, c) => (a * 257 + c) % P))
      else cs.sliding(k).map(g => g.tail.foldLeft(g.head)((a, c) => (a * 257 + c) % P)).toSeq
    val mins = if (kh.length < w) Seq(kh.min) else kh.sliding(w).map(_.min).toSeq
    mins.distinct.sorted
  }

  private def viaSpark(texts: Seq[String], k: Int, w: Int): Seq[Seq[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(HashExpressions.winnowFingerprint(col("text"), k, w).as("fp"))
      .as[Seq[Long]].collect().toSeq
  }

  test("expression matches the reference implementation") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefg "
    val texts = Seq.tabulate(50)(_ =>
      Seq.fill(5 + rnd.nextInt(120))(alpha(rnd.nextInt(alpha.length))).mkString)
    assert(viaSpark(texts, 8, 4) == texts.map(ref(_, 8, 4)))
  }

  test("short inputs: under k chars and under w k-grams") {
    val texts = Seq("ab", "abcdefgh", "abcdefghij")
    assert(viaSpark(texts, 8, 4) == texts.map(ref(_, 8, 4)))
  }

  test("interpreted eval equals codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val texts = Seq("the quick brown fox jumps over the lazy dog", "ab", "")
    val interp = texts.map { t =>
      graft.plans.WinnowFingerprint(Literal(t), 8, 4)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    }
    // df path compiles through doGenCode; ref covers the "" edge too
    assert(interp == texts.map(ref(_, 8, 4)))
    assert(viaSpark(texts.take(2), 8, 4) == interp.take(2))
  }

  test("detection guarantee: shared run of k+w-1 chars intersects") {
    val rnd = new scala.util.Random(11)
    val shared = "zqxjvzqxjvz" // k+w-1 = 11 chars, distinct alphabet
    (1 to 20).foreach { _ =>
      def noise = Seq.fill(30 + rnd.nextInt(40))(
        ('a' + rnd.nextInt(6)).toChar).mkString
      val a = noise + shared + noise
      val b = noise + shared + noise
      val fa = ref(a, 8, 4).toSet
      val fb = ref(b, 8, 4).toSet
      assert(fa.intersect(fb).nonEmpty, s"no shared fingerprint: $a | $b")
    }
  }
}
