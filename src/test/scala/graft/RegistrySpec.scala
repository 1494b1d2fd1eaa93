package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-integrity pins: the module maps merge with `++`, so a
  * duplicate key would SILENTLY shadow an earlier module's registered
  * (and oracle-green) query — a drafted round-10 `ev_stickiness`
  * briefly replaced the weekly one exactly that way. No SparkSession
  * needed: these are pure map properties. */
class RegistrySpec extends AnyFunSuite {

  test("module query registries are pairwise key-disjoint (no shadowing)") {
    val sizes = SparkEntry.queryModules.map(_.size).sum
    val merged = SparkEntry.queries.size
    assert(sizes == merged, {
      val seen = scala.collection.mutable.Map[String, Int]()
      SparkEntry.queryModules.zipWithIndex.foreach { case (m, i) =>
        m.keys.foreach(k => if (seen.contains(k))
          fail(s"query key '$k' in modules ${seen(k)} and $i")
        else seen(k) = i)
      }
      s"duplicate query keys: module sizes sum $sizes != merged $merged"
    })
  }

  test("module oracle registries are pairwise key-disjoint") {
    assert(SparkEntry.oracleModules.map(_.size).sum == SparkEntry.oracleSql.size)
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).mkString(", ")}")
  }

}
