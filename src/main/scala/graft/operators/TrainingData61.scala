package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10 batch 61: the MinHash banding-config ADVISOR — which
  * (bands, rows) split of the 64-perm signature to run for a target
  * threshold: expected recall/false-candidate mass of every valid
  * config against the OBSERVED pair-similarity distribution, the
  * design question dedup_lsh_recall_curve audits after the fact.
  * Full-replay DuckDB oracle.
  */
object TrainingData61 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // dedup_banding_advisor — for every (b, r) with b·r = 64: the
  // s-curve 50% threshold (1/b)^(1/r), the expected recall over the
  // observed J ≥ 0.7 pair mass, and the expected catch over the
  // borderline 0.5 ≤ J < 0.7 mass (false-candidate work): catch
  // probability 1−(1−J^r)^b evaluated at 0.05-bucket midpoints of
  // the registered exact-Jaccard pair distribution — the bounded-
  // bucket formulation of dedup_lsh_recall_curve, so the advisor
  // never materializes per-pair lists (≤14 buckets × 4 configs
  // regardless of corpus size). Folds run in bucket order.
  // ---------------------------------------------------------------
  private val BandConfigs = Seq(4, 8, 16, 32) // r = 64 / b

  val dedupBandingAdvisor: Q = (s, dir) => {
    val bucketed = Dedup.ngramJaccardPairs(s, dir, 3, 0.5)
      .withColumn("bucket", floor(col("jaccard") * 20.0) / 20.0)
      .groupBy(col("bucket")).agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(eager = false) // all four configs fold the same buckets
    def fold(v: String): Column =
      expr("aggregate(sort_array(collect_list(named_struct(" +
        s"'bucket', bucket, 'v', $v))), 0D, (a, q) -> a + q.v)")
    val scored = bucketed
      .select(col("bucket"), col("n"),
        explode(array(BandConfigs.map(b =>
          struct(lit(b.toLong).as("b"), lit((64 / b).toLong).as("r"))): _*))
          .as("c"))
      .select(col("bucket"), col("n"),
        col("c.b").as("bands"), col("c.r").as("rows_per_band"))
      // Midpoint clamped to 1.0: the jaccard=1.0 bucket (exact dups)
      // would otherwise evaluate at 1.025, an invalid probability.
      .withColumn("p_catch", lit(1.0) -
        pow(lit(1.0) - pow(least(col("bucket") + lit(0.025), lit(1.0)),
          d(col("rows_per_band"))), d(col("bands"))))
      .withColumn("hi", col("bucket") >= 0.7)
    scored.groupBy(col("bands"), col("rows_per_band"))
      .agg(sum(when(col("hi"), col("n")).otherwise(0L)).cast("long")
          .as("n_pairs_hi"),
        sum(when(!col("hi"), col("n")).otherwise(0L)).cast("long")
          .as("n_pairs_lo"),
        fold("CASE WHEN hi THEN CAST(n AS DOUBLE) * p_catch ELSE 0D END")
          .as("catch_hi"),
        fold("CASE WHEN NOT hi THEN CAST(n AS DOUBLE) * p_catch ELSE 0D END")
          .as("catch_lo"))
      .select(col("bands"), col("rows_per_band"),
        round(pow(lit(1.0) / d(col("bands")),
          lit(1.0) / d(col("rows_per_band"))), 6).as("threshold_50"),
        col("n_pairs_hi"),
        when(col("n_pairs_hi") > 0,
          round(col("catch_hi") / d(col("n_pairs_hi")), 6))
          .as("exp_recall_hi"),
        col("n_pairs_lo"),
        when(col("n_pairs_lo") > 0,
          round(col("catch_lo") / d(col("n_pairs_lo")), 6))
          .as("exp_catch_lo"))
      .orderBy(col("bands"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_banding_advisor" -> dedupBandingAdvisor)

  val oracles: Map[String, String] = Map(
    "dedup_banding_advisor" ->
      s"""WITH pairs AS (SELECT * FROM (
         |${TrainingData.oracles("dedup_ngram_jaccard")}
         |)),
         |bucketed AS (
         |  SELECT floor(jaccard * 20.0) / 20.0 AS bucket,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM pairs GROUP BY 1),
         |cfg AS (SELECT * FROM (VALUES ${BandConfigs.map(b =>
        s"(CAST(${b} AS BIGINT), CAST(${64 / b} AS BIGINT))").mkString(", ")})
         |  AS t(bands, rows_per_band)),
         |scored AS (
         |  SELECT bucket, n, bands, rows_per_band, bucket >= 0.7 AS hi,
         |         1.0 - pow(1.0 - pow(least(bucket + 0.025, 1.0),
         |           rows_per_band::DOUBLE), bands::DOUBLE) AS p_catch
         |  FROM bucketed CROSS JOIN cfg),
         |agg AS (
         |  SELECT bands, rows_per_band,
         |         CAST(sum(CASE WHEN hi THEN n ELSE 0 END) AS BIGINT)
         |           AS n_pairs_hi,
         |         CAST(sum(CASE WHEN NOT hi THEN n ELSE 0 END) AS BIGINT)
         |           AS n_pairs_lo,
         |         list_sum(list(CASE WHEN hi THEN n::DOUBLE * p_catch
         |           ELSE 0.0 END ORDER BY bucket)) AS catch_hi,
         |         list_sum(list(CASE WHEN NOT hi THEN n::DOUBLE * p_catch
         |           ELSE 0.0 END ORDER BY bucket)) AS catch_lo
         |  FROM scored GROUP BY 1, 2)
         |SELECT bands, rows_per_band,
         |       round(pow(1.0 / bands::DOUBLE,
         |         1.0 / rows_per_band::DOUBLE), 6) AS threshold_50,
         |       n_pairs_hi,
         |       CASE WHEN n_pairs_hi > 0
         |         THEN round(catch_hi / n_pairs_hi::DOUBLE, 6) END
         |         AS exp_recall_hi,
         |       n_pairs_lo,
         |       CASE WHEN n_pairs_lo > 0
         |         THEN round(catch_lo / n_pairs_lo::DOUBLE, 6) END
         |         AS exp_catch_lo
         |FROM agg ORDER BY bands""".stripMargin)
}
