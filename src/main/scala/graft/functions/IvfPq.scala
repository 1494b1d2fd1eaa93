package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Grain

/** IVF-PQ index build/search split out of the registered
  * sim_ivf_pq_search operator (TrainingData4) so the SAME dataflow
  * serves both the in-query form and the persisted
  * build-once/search-many path (sources.AnnIndex): a real deployment
  * never rebuilds codebooks per query — it stores coarse centroids +
  * sub-codebook + codes and reads them at search time. The build is
  * deterministic (md5-ranked seed vectors; FAISS IVFPQ shape, Jégou
  * et al. 2011), so the driver's DuckDB oracle replays it
  * end-to-end, and the persisted round-trip is differentially pinned
  * equal to the in-query operator (AnnIndexSpec).
  */
object IvfPq {

  /** The three tables a persisted IVF-PQ index stores. */
  final case class PqIndex(coarse: DataFrame, subCode: DataFrame,
    codes: DataFrame)

  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, v) => acc + v)

  private def subOf(c: Column, mm: Column, m8: Int): Column =
    slice(c, mm * lit(m8) + 1, lit(m8))

  /** Coarse quantizer = first `nCells` corpus vectors in md5 order;
    * PQ sub-codebook = the NEXT `nCells` vectors' cell residuals
    * split into `m8` subspaces; every vector stores (cell, m8
    * sub-codes). Both codebooks are tiny at any corpus size; the
    * encode pass is one broadcast argmin map over the corpus. */
  def build(emb: DataFrame, nCells: Int, m8: Int): PqIndex = {
    val ranked = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(2 * nCells)
      .withColumn("rn", row_number().over(
        Grain.bounded(md5(col("vec_id").cast("string")), col("vec_id"))))
    val coarse = ranked.filter(col("rn") <= nCells)
      .select(col("rn").cast("long").as("cid"), col("e").as("ce"))
    val assigned = assignResidual(coarse, emb).localCheckpoint()
    val subCode = ranked.filter(col("rn") > nCells)
      .select((col("rn") - nCells).cast("long").as("scid"), col("vec_id"))
      .join(assigned, "vec_id")
      .select(col("scid"), posexplode(transform(sequence(lit(0), lit(m8 - 1)),
        mm => subOf(col("r"), mm, m8))).as(Seq("m", "sc")))
    val codes = assigned
      .select(col("vec_id"), col("cell"),
        posexplode(transform(sequence(lit(0), lit(m8 - 1)),
          mm => subOf(col("r"), mm, m8))).as(Seq("m", "sub")))
      .join(broadcast(subCode), "m")
      .withColumn("sd", l2(col("sub"), col("sc")))
      .groupBy(col("vec_id"), col("cell"), col("m"))
      .agg(min(struct(col("sd").as("sd"), col("scid").as("scid"))).as("best"))
      .select(col("vec_id"), col("cell"), col("m"), col("best.scid").as("code"))
    PqIndex(coarse, subCode, codes)
  }

  /** Corpus → (cell, residual): argmin L2 over the broadcast coarse
    * codebook (ties → smaller cell id). */
  private def assignResidual(coarse: DataFrame, src: DataFrame): DataFrame =
    src.crossJoin(broadcast(coarse))
      .withColumn("dist", l2(col("e"), col("ce")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell"),
        expr("zip_with(e, ce, (a, b) -> a - b)").as("r"))

  /** ADC search over a built (or read-back) index: queries probe
    * their `nProbe` nearest cells, build the per-cell 8×16 LUT from
    * their residuals, and candidate distance is the m-sorted fold of
    * `m8` table entries — no candidate vector is read at search
    * time. `queries` is (vec_id, e). Output matches
    * sim_ivf_pq_search. */
  def search(idx: PqIndex, queries: DataFrame, m8: Int, nProbe: Int,
      k: Int): DataFrame = {
    val probes = queries
      .crossJoin(broadcast(idx.coarse))
      .withColumn("dist", l2(col("e"), col("ce")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))))
      .filter(col("rk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cid").as("cell"),
        expr("zip_with(e, ce, (a, b) -> a - b)").as("qr"))
    val lut = probes
      .select(col("query_id"), col("cell"),
        posexplode(transform(sequence(lit(0), lit(m8 - 1)),
          mm => subOf(col("qr"), mm, m8))).as(Seq("m", "qsub")))
      .join(broadcast(idx.subCode), "m")
      .select(col("query_id"), col("cell"), col("m"), col("scid"),
        l2(col("qsub"), col("sc")).as("lutd"))
    val lutR = lut.select(col("query_id"), col("cell").as("lcell"),
      col("m").as("lm"), col("scid"), col("lutd"))
    idx.codes
      .join(broadcast(lutR), col("cell") === col("lcell") &&
        col("m") === col("lm") && col("code") === col("scid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(expr("aggregate(sort_array(collect_list(struct(m, lutd))), 0D," +
        " (a, x) -> a + x.lutd)").as("adist"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adist"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adist"), 6).as("approx_dist"), col("rk"))
      .orderBy(col("query_id"), col("rk"))
  }
}
