package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 74: bias-corrected bootstrap inference, a SemDeDup
  * threshold advisor, and the data-quality column profiler.
  *
  *  - a_bootstrap_bca — the BCa confidence interval (Efron 1987) on
  *    mean event value, on top of the registered deterministic
  *    Poisson bootstrap: bias correction z₀ from the rep
  *    distribution, acceleration from the jackknife (closed form
  *    for the mean), probit/Φ via portable polynomial
  *    approximations (Acklam; A&S 7.1.26 — the a_bh_fdr precedent).
  *  - sim_eps_advisor — given target dedup rates, the cosine
  *    threshold ε a SemDeDup pass should use, read off the exact
  *    order statistics of the k-NN edge cosines.
  *  - q_dq_profile — the per-column null/NDV/uniqueness profile
  *    (the contract table every warehouse publishes; joins
  *    q_dq_freshness / q_dq_referential as the third audit).
  */
object TrainingData74 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_bootstrap_bca — BCa on mean(value): the percentile interval's
  // two corrections. z₀ = Φ⁻¹(#{mean_b < θ̂}/B) (clamped into
  // [1/(B+1), B/(B+1)]); acceleration a = Σd³/(6·(Σd²)^{3/2}·√n) —
  // the jackknife closed form for the mean (θ̄₍ᵢ₎ deviations are
  // (xᵢ−x̄)/(n−1), so the (n−1) powers cancel). Central power sums
  // are EXACT: cent-quantized values, decimal(38) Σx²/Σx³,
  // A2 = nΣx²−S², A3 = n²Σx³−3nSΣx²+2S³, each scaled to a BIGINT
  // by an integral division (÷10⁶ / ÷10¹⁵ — headroom through ~10⁹
  // rows) before its ONE double conversion (the
  // a_var_merge discipline — a raw dec38→double conversion rounds
  // differently across engines). Φ⁻¹ is Acklam's rational
  // approximation, Φ the A&S 7.1.26 erf polynomial — pure
  // +,×,÷,ln,sqrt,exp arithmetic, identical both engines. Adjusted
  // quantiles map to EXACT order statistics of the 64 rep means
  // (index floor(α·B)+1, clamped). Scale shape: the B×corpus
  // explode is the registered bootstrap's own (map-combining per
  // rep); everything after runs on the 64-row rep frame.
  // ---------------------------------------------------------------
  private val BcaB = 64
  private val ZAlpha = 1.959963984540054 // Φ⁻¹(0.975)

  /** Acklam's Φ⁻¹ — branch thresholds and coefficients verbatim. */
  private def probit(p: Column): Column = {
    val pl = 0.02425
    def central: Column = {
      val q = p - 0.5; val r = q * q
      (((((lit(-39.69683028665376) * r + 220.9460984245205) * r +
        -275.9285104469687) * r + 138.357751867269) * r +
        -30.66479806614716) * r + 2.506628277459239) * q /
        ((((((lit(-54.47609879822406) * r + 161.5858368580409) * r +
          -155.6989798598866) * r + 66.80131188771972) * r +
          -13.28068155288572) * r) + 1.0)
    }
    def tail(pp: Column): Column = {
      val q = sqrt(lit(-2.0) * log(pp))
      (((((lit(-0.007784894002430293) * q + -0.3223964580411365) * q +
        -2.400758277161838) * q + -2.549732539343734) * q +
        4.374664141464968) * q + 2.938163982698783) /
        (((((lit(0.007784695709041462) * q + 0.3224671290700398) * q +
          2.445134137142996) * q + 3.754408661907416) * q) + 1.0)
    }
    when(p < pl, tail(p))
      .when(p > 1.0 - pl, -tail(lit(1.0) - p))
      .otherwise(central)
  }

  /** A&S 7.1.26 erf (x ≥ 0) — the a_bh_fdr polynomial. */
  private def erfAS(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = t * (lit(0.254829592) +
      t * (lit(-0.284496736) +
        t * (lit(1.421413741) +
          t * (lit(-1.453152027) + t * lit(1.061405429)))))
    lit(1.0) - poly * exp(-(x * x))
  }

  private def phi(z: Column): Column =
    when(z >= 0.0, lit(0.5) * (lit(1.0) + erfAS(z / math.sqrt(2.0))))
      .otherwise(lit(0.5) * (lit(1.0) - erfAS(-z / math.sqrt(2.0))))

  val aBootstrapBca: Q = (s, dir) => {
    val base = Tables.table(s, dir, "events")
      .select(col("event_id"),
        expr("CAST(floor(CAST(value AS DECIMAL(18,2)) * 1000000) AS BIGINT)")
          .as("m"),
        round(col("value") * 100).cast("long").as("cents"))
      .localCheckpoint(eager = false) // reps + point + the central power sums
    val tArr = array(TrainingData6.poissonT.map(lit): _*)
    val rep = base
      .withColumn("b", explode(sequence(lit(0), lit(BcaB - 1))))
      .withColumn("h", conv(substring(md5(concat(
        col("event_id").cast("string"), lit("#"), col("b").cast("string"))),
        1, 12), 16, 10).cast("long"))
      .withColumn("w", size(filter(tArr, t => t <= col("h"))).cast("long"))
      .groupBy(col("b"))
      .agg(sum(col("w")).cast("long").as("nb"),
        sum(col("w") * col("m")).cast("long").as("sb"))
      .withColumn("mean_b", d(col("sb")) / d(col("nb")) / lit(1000000.0))
    val point = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("m")).cast("long").as("sm"),
      sum(col("cents")).cast("decimal(38,0)").as("s1"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("s2"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)") *
        col("cents").cast("decimal(38,0)")).cast("decimal(38,0)").as("s3"))
      .withColumn("theta", d(col("sm")) / d(col("n")) / lit(1000000.0))
      // A2 = nΣx²−S², A3 = n²Σx³−3nSΣx²+2S³ — exact, then scaled
      // integral divisions give the ONE bigint→double each
      .withColumn("a2d",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1) div 1000000" +
          " AS BIGINT)").cast("double") * lit(1.0e6))
      .withColumn("a3d",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))" +
          " * s3 - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2" +
          " + 2 * s1 * s1 * s1) div 1000000000000000 AS BIGINT)")
          .cast("double") * lit(1.0e15))
      .withColumn("accel",
        col("a3d") / (lit(6.0) * pow(col("a2d"), 1.5) * sqrt(d(col("n")))))
    val folded = rep.agg(
      sort_array(collect_list(struct(col("mean_b"), col("b")))).as("byv"))
    val j = folded.crossJoin(broadcast(point))
      .withColumn("cnt_below", expr(
        "CAST(size(filter(byv, x -> x.mean_b < theta)) AS BIGINT)"))
      .withColumn("p0",
        least(greatest(d(col("cnt_below")) / lit(BcaB.toDouble),
          lit(1.0 / (BcaB + 1))), lit(BcaB.toDouble / (BcaB + 1))))
      .withColumn("z0", probit(col("p0")))
      .withColumn("zl", col("z0") +
        (col("z0") - ZAlpha) /
          (lit(1.0) - col("accel") * (col("z0") - ZAlpha)))
      .withColumn("zu", col("z0") +
        (col("z0") + ZAlpha) /
          (lit(1.0) - col("accel") * (col("z0") + ZAlpha)))
      .withColumn("al", phi(col("zl")))
      .withColumn("au", phi(col("zu")))
      .withColumn("i1", least(greatest(
        (floor(col("al") * BcaB) + 1).cast("int"), lit(1)), lit(BcaB)))
      .withColumn("i2", least(greatest(
        (floor(col("au") * BcaB) + 1).cast("int"), lit(1)), lit(BcaB)))
    j.select(col("n").as("n_events"), lit(BcaB.toLong).as("b_reps"),
      round(col("theta"), 6).as("point_mean"),
      round(col("z0"), 6).as("z0"),
      round(col("accel"), 6).as("accel"),
      round(col("al"), 6).as("alpha_lo"),
      round(col("au"), 6).as("alpha_hi"),
      round(element_at(col("byv"), col("i1")).getField("mean_b"), 6)
        .as("bca_lo"),
      round(element_at(col("byv"), col("i2")).getField("mean_b"), 6)
        .as("bca_hi"),
      round(element_at(col("byv"), 2).getField("mean_b"), 6).as("pct_lo"),
      round(element_at(col("byv"), BcaB - 1).getField("mean_b"), 6)
        .as("pct_hi"))
  }

  // ---------------------------------------------------------------
  // sim_eps_advisor — "what ε makes SemDeDup drop X% of the
  // similarity edges?": exact order statistics of the k-NN edge
  // cosines via the Ranking two-phase global rank (never a
  // single-partition sort of the edge stream). For each target rate
  // the advisor reports the cutoff cosine (min cos among the top-k
  // edges), the edge count actually captured, and how many distinct
  // vectors the cut touches. Scale shape: edges = 3n rows from the
  // shared TopKAgg build; rank + one broadcast totals cross + a
  // 3-rate explode over the top slice only.
  // ---------------------------------------------------------------
  private val EpsRates = Seq(0.01, 0.05, 0.10)

  val simEpsAdvisor: Q = (s, dir) => {
    val (edges, assigned) = TrainingData2.knnEdgesWithAssigned(s, dir)
    val embs = assigned.select(col("vec_id"), col("e"))
    val de = edges
      .join(embs.select(col("vec_id").as("src"), col("e").as("es")), "src")
      .join(embs.select(col("vec_id").as("dst"), col("e").as("ed")), "dst")
      .select(col("src"), col("dst"),
        graft.functions.Similarity.dot(col("es"), col("ed")).as("cos"))
    val ranked = Ranking.withGlobalRank(de, "rk",
      col("cos"), col("src"), col("dst")).localCheckpoint(eager = false)
    val tot = ranked.agg(count(lit(1)).cast("long").as("n_edges"))
    val rates = array(EpsRates.map(lit): _*)
    ranked.crossJoin(broadcast(tot))
      .select(col("*"), explode(rates).as("rate"))
      .withColumn("k", greatest(lit(1L),
        floor(col("rate") * d(col("n_edges"))).cast("long")))
      .filter(col("rk") > col("n_edges") - col("k"))
      .groupBy(col("rate"))
      .agg(max(col("n_edges")).as("n_edges"), max(col("k")).as("k_edges"),
        min(col("cos")).as("eps"),
        countDistinct(col("src")).cast("long").as("n_src_affected"))
      .select(col("rate"), col("n_edges"), col("k_edges"),
        round(col("eps"), 6).as("eps"), col("n_src_affected"))
      .orderBy(col("rate"))
  }

  // ---------------------------------------------------------------
  // q_dq_profile — per column: rows, nulls, exact NDV, uniqueness.
  // Multiple exact count-distincts per table are the profiler's
  // honest cost (Catalyst expands one scan per distinct column —
  // the standard profile-job shape; swap in HLL sketches via
  // a_approx_distinct when 2% error is acceptable at 100 TB). The
  // unpivot is an 18-row literal explode.
  // ---------------------------------------------------------------
  private val ProfileCols: Seq[(String, Seq[String])] = Seq(
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_totalprice", "o_orderdate"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_quantity",
      "l_returnflag"),
    "events" -> Seq("event_id", "user_id", "event_type", "value"),
    "documents" -> Seq("doc_id", "lang", "source", "text"))

  val qDqProfile: Q = (s, dir) => {
    val legs = ProfileCols.map { case (tname, cols) =>
      val t = Tables.table(s, dir, tname)
      val aggs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
          .as(s"null_$c"),
          countDistinct(col(c)).cast("long").as(s"ndv_$c"))
      }
      val st = t.agg(count(lit(1)).cast("long").as("n_rows"),
        aggs: _*)
      val rows = cols.map { c =>
        struct(lit(c).as("column_name"), col(s"null_$c").as("n_null"),
          col(s"ndv_$c").as("ndv"))
      }
      st.select(lit(tname).as("table_name"), col("n_rows"),
        explode(array(rows: _*)).as("r"))
        .select(col("table_name"), col("r.column_name").as("column_name"),
          col("n_rows"), col("r.n_null").as("n_null"),
          round(d(col("r.n_null")) / d(col("n_rows")), 6).as("null_rate"),
          col("r.ndv").as("ndv"),
          (col("r.ndv") === col("n_rows") - col("r.n_null")).as("is_unique"))
    }
    legs.reduce(_.unionAll(_)).orderBy(col("table_name"), col("column_name"))
  }

  val queries: Map[String, Q] = Map(
    "a_bootstrap_bca" -> aBootstrapBca,
    "sim_eps_advisor" -> simEpsAdvisor,
    "q_dq_profile" -> qDqProfile)

  /** Hex md5 prefix → integer (fold twin of conv(substr(md5),16,10)). */
  private def hexSql(x: String, n: Int): String =
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, $n), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  /** Acklam probit as a DuckDB expression over `p` (a column ref). */
  private def probitSql(p: String): String = {
    val central =
      s"""((((((-39.69683028665376) * (($p - 0.5) * ($p - 0.5))
         |  + 220.9460984245205) * (($p - 0.5) * ($p - 0.5))
         |  + (-275.9285104469687)) * (($p - 0.5) * ($p - 0.5))
         |  + 138.357751867269) * (($p - 0.5) * ($p - 0.5))
         |  + (-30.66479806614716)) * (($p - 0.5) * ($p - 0.5))
         |  + 2.506628277459239) * ($p - 0.5)
         |/ ((((((-54.47609879822406) * (($p - 0.5) * ($p - 0.5))
         |  + 161.5858368580409) * (($p - 0.5) * ($p - 0.5))
         |  + (-155.6989798598866)) * (($p - 0.5) * ($p - 0.5))
         |  + 66.80131188771972) * (($p - 0.5) * ($p - 0.5))
         |  + (-13.28068155288572)) * (($p - 0.5) * ($p - 0.5)) + 1.0)"""
        .stripMargin.replaceAll("\n", " ")
    def tail(pp: String) =
      s"""(((((((-0.007784894002430293) * sqrt(-2.0 * ln($pp))
         |  + (-0.3223964580411365)) * sqrt(-2.0 * ln($pp))
         |  + (-2.400758277161838)) * sqrt(-2.0 * ln($pp))
         |  + (-2.549732539343734)) * sqrt(-2.0 * ln($pp))
         |  + 4.374664141464968) * sqrt(-2.0 * ln($pp))
         |  + 2.938163982698783)
         |/ (((((0.007784695709041462 * sqrt(-2.0 * ln($pp))
         |  + 0.3224671290700398) * sqrt(-2.0 * ln($pp))
         |  + 2.445134137142996) * sqrt(-2.0 * ln($pp))
         |  + 3.754408661907416) * sqrt(-2.0 * ln($pp))) + 1.0))"""
        .stripMargin.replaceAll("\n", " ")
    s"""CASE WHEN $p < 0.02425 THEN ${tail(p)}
       |     WHEN $p > 0.97575 THEN -${tail(s"(1.0 - $p)")}
       |     ELSE $central END""".stripMargin
  }

  /** A&S erf Φ over `z` (a column ref) — the a_bh_fdr polynomial. */
  private def phiSql(z: String): String = {
    def erf(x: String) =
      s"""(1.0 - (1.0 / (1.0 + 0.3275911 * $x)) * (0.254829592
         |  + (1.0 / (1.0 + 0.3275911 * $x)) * ((-0.284496736)
         |  + (1.0 / (1.0 + 0.3275911 * $x)) * (1.421413741
         |  + (1.0 / (1.0 + 0.3275911 * $x)) * ((-1.453152027)
         |  + (1.0 / (1.0 + 0.3275911 * $x)) * 1.061405429))))
         |  * exp(-($x * $x)))""".stripMargin.replaceAll("\n", " ")
    s"""CASE WHEN $z >= 0.0
       |     THEN 0.5 * (1.0 + ${erf(s"($z / sqrt(2.0))")})
       |     ELSE 0.5 * (1.0 - ${erf(s"(-($z) / sqrt(2.0))")}) END"""
      .stripMargin
  }

  val oracles: Map[String, String] = Map(
    "a_bootstrap_bca" -> {
      val tList = TrainingData6.poissonT.mkString("[", ", ", "]")
      s"""WITH base AS (
         |  SELECT event_id,
         |         CAST(floor(CAST(value AS DECIMAL(18,2)) * 1000000)
         |           AS BIGINT) AS m,
         |         CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events),
         |rep AS (
         |  SELECT t.b,
         |         CAST(sum(CAST(len(list_filter($tList, x -> x <=
         |           ${hexSql(
        "CAST(base.event_id AS VARCHAR) || '#' || CAST(t.b AS VARCHAR)",
        12)})) AS BIGINT)) AS BIGINT) AS nb,
         |         CAST(sum(CAST(len(list_filter($tList, x -> x <=
         |           ${hexSql(
        "CAST(base.event_id AS VARCHAR) || '#' || CAST(t.b AS VARCHAR)",
        12)})) AS BIGINT) * base.m) AS BIGINT) AS sb
         |  FROM base CROSS JOIN (SELECT unnest(range(0, $BcaB)) AS b) t
         |  GROUP BY 1),
         |reps AS (
         |  SELECT list(struct_pack(mean_b := mb, b := b)
         |           ORDER BY mb, b) AS byv
         |  FROM (SELECT b, CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
         |          / 1000000.0 AS mb FROM rep)),
         |pt AS (
         |  -- HUGEINT, not DECIMAL(38): DuckDB silently promotes
         |  -- DECIMAL(38)x DECIMAL(38) to DOUBLE (precision loss, and a
         |  -- BIGINT-cast overflow at the 10x corpus); HUGEINT keeps
         |  -- the whole A2/A3 computation exact 128-bit like Spark's
         |  -- decimal path
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(m) AS BIGINT) AS sm,
         |         CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s1,
         |         CAST(sum(CAST(cents AS HUGEINT)
         |           * CAST(cents AS HUGEINT)) AS HUGEINT) AS s2,
         |         CAST(sum(CAST(cents AS HUGEINT)
         |           * CAST(cents AS HUGEINT)
         |           * CAST(cents AS HUGEINT)) AS HUGEINT) AS s3
         |  FROM base),
         |mo AS (
         |  SELECT n, CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
         |           AS theta,
         |         CAST((CAST(n AS HUGEINT) * s2 - s1 * s1) // 1000000
         |           AS BIGINT) * 1.0e6 AS a2d,
         |         CAST((CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
         |             * s3 - 3 * CAST(n AS HUGEINT) * s1 * s2
         |             + 2 * s1 * s1 * s1) // 1000000000000000 AS BIGINT)
         |           * 1.0e15 AS a3d
         |  FROM pt),
         |acc AS (
         |  SELECT n, theta,
         |         a3d / (6.0 * pow(a2d, 1.5) * sqrt(CAST(n AS DOUBLE)))
         |           AS accel
         |  FROM mo),
         |z0t AS (
         |  SELECT n, theta, accel, byv,
         |         least(greatest(
         |           CAST(len(list_filter(byv, x -> x.mean_b < theta))
         |             AS DOUBLE) / $BcaB.0,
         |           1.0 / ${BcaB + 1}), $BcaB.0 / ${BcaB + 1}) AS p0
         |  FROM acc CROSS JOIN reps),
         |zz AS (
         |  SELECT *, ${probitSql("p0")} AS z0 FROM z0t),
         |adj AS (
         |  SELECT *,
         |         z0 + (z0 - $ZAlpha) / (1.0 - accel * (z0 - $ZAlpha))
         |           AS zl,
         |         z0 + (z0 + $ZAlpha) / (1.0 - accel * (z0 + $ZAlpha))
         |           AS zu
         |  FROM zz),
         |ab AS (
         |  SELECT *, ${phiSql("zl")} AS al, ${phiSql("zu")} AS au
         |  FROM adj),
         |fin AS (
         |  SELECT *,
         |         least(greatest(CAST(floor(al * $BcaB) + 1 AS INT), 1),
         |           $BcaB) AS i1,
         |         least(greatest(CAST(floor(au * $BcaB) + 1 AS INT), 1),
         |           $BcaB) AS i2
         |  FROM ab)
         |SELECT n AS n_events, CAST($BcaB AS BIGINT) AS b_reps,
         |       round(theta, 6) AS point_mean,
         |       round(z0, 6) AS z0,
         |       round(accel, 6) AS accel,
         |       round(al, 6) AS alpha_lo,
         |       round(au, 6) AS alpha_hi,
         |       round(byv[i1].mean_b, 6) AS bca_lo,
         |       round(byv[i2].mean_b, 6) AS bca_hi,
         |       round(byv[2].mean_b, 6) AS pct_lo,
         |       round(byv[${BcaB - 1}].mean_b, 6) AS pct_hi
         |FROM fin""".stripMargin
    },
    "sim_eps_advisor" -> {
      val dotS = "list_sum(list_transform(range(1, len(es.emb) + 1)," +
        " i -> es.emb[i] * et.emb[i]))"
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |de AS (
         |  SELECT ed.src, ed.dst, $dotS AS cos
         |  FROM edges ed JOIN e es ON ed.src = es.vec_id
         |                JOIN e et ON ed.dst = et.vec_id),
         |rkd AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY cos, src, dst)
         |    AS BIGINT) AS rk
         |  FROM de),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM rkd),
         |grid AS (SELECT unnest(CAST([${EpsRates.mkString(", ")}]
         |  AS DOUBLE[])) AS rate),
         |topk AS (
         |  SELECT g.rate, t.n_edges,
         |         greatest(1, CAST(floor(g.rate
         |           * CAST(t.n_edges AS DOUBLE)) AS BIGINT)) AS k,
         |         r.src, r.dst, r.cos, r.rk
         |  FROM rkd r CROSS JOIN tot t CROSS JOIN grid g
         |  WHERE r.rk > t.n_edges - greatest(1, CAST(floor(g.rate
         |    * CAST(t.n_edges AS DOUBLE)) AS BIGINT)))
         |SELECT rate, CAST(max(n_edges) AS BIGINT) AS n_edges,
         |       CAST(max(k) AS BIGINT) AS k_edges,
         |       round(min(cos), 6) AS eps,
         |       CAST(count(DISTINCT src) AS BIGINT) AS n_src_affected
         |FROM topk GROUP BY 1 ORDER BY rate""".stripMargin
    },
    "q_dq_profile" -> {
      val legs = ProfileCols.flatMap { case (t, cols) =>
        cols.map { c =>
          s"""SELECT '$t' AS table_name, '$c' AS column_name,
             |       CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(*) - count($c) AS BIGINT) AS n_null,
             |       round(CAST(count(*) - count($c) AS DOUBLE)
             |         / CAST(count(*) AS DOUBLE), 6) AS null_rate,
             |       CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             |       count(DISTINCT $c) = count($c) AS is_unique
             |FROM $t""".stripMargin
        }
      }
      legs.mkString("", "\nUNION ALL\n",
        "\nORDER BY table_name, column_name")
    })
}
