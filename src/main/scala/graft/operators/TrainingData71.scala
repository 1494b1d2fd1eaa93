package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 71: embedding post-processing and arrival-process
  * diagnostics.
  *
  *  - e_abtt_isotropy — "All-But-The-Top" (Mu & Viswanath, ICLR
  *    2018): remove the mean and the top principal direction from
  *    the embedding corpus and measure how much anisotropy
  *    (E[cos] of random pairs = ‖mean unit vector‖²) the correction
  *    recovers — the standard cheap fix before cosine ANN when one
  *    direction dominates (cf. e_anisotropy, e_pca_power).
  *  - ev_fano_dispersion — per event type, the Fano factor of the
  *    per-minute arrival counts on the full observed span (empty
  *    minutes included WITHOUT materializing them) and the χ²
  *    dispersion z — the Poisson-or-not triage before any queueing
  *    or staffing model trusts exponential interarrivals.
  */
object TrainingData71 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // e_abtt_isotropy — the e_pca_power portability discipline end to
  // end: coordinates quantize to the 2⁻²⁰ grid, so the per-dim sums
  // M_j and Gram sums S_jk are EXACT LONGS; the centered covariance
  // C_jk = S_jk/(n·2⁴⁰) − μ_j·μ_k is one deterministic double
  // expression per entry; the 12-step power iteration folds
  // j-ascending (recursive-CTE twin in the oracle). Each vector is
  // then centered, has its PC1 component removed, is unit-
  // normalized, and the before/after anisotropy is ‖mean unit‖²
  // with the mean folding in vec_id order (the e_anisotropy float
  // policy). Scale shape: one 64-way posexplode with map-side
  // partial sums (shuffle = 64×65 constant rows), one broadcast of
  // the 64-double direction back to the corpus, one linear pass —
  // the iteration itself runs on ONE 4096-double row.
  // ---------------------------------------------------------------
  val eAbttIsotropy: Q = (s, dir) => {
    val dim = 64
    val q = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0)" +
          " AS BIGINT))").as("qv"))
      .localCheckpoint(eager = false) // sums leg AND the per-vector projection leg
    val ex = q.select(col("qv"), posexplode(col("qv")).as(Seq("i0", "qi")))
    val gramExprs = (0 until dim).map(j =>
      sum(col("qi") * element_at(col("qv"), j + 1)).cast("long").as(s"s$j"))
    val sums = ex.groupBy(col("i0"))
      .agg(sum(col("qi")).cast("long").as("mrow"), gramExprs: _*)
    val flat = sums
      .select(col("i0"), col("mrow"),
        array((0 until dim).map(j => col(s"s$j")): _*).as("sarr"))
      .agg(sort_array(collect_list(struct(col("i0"), col("mrow"),
        col("sarr")))).as("rows"))
      .select(expr("transform(rows, r -> r.mrow)").as("mv"),
        flatten(expr("transform(rows, r -> r.sarr)")).as("gflat"))
    val nVec = q.agg(count(lit(1)).as("n_vec"))
    def matvec(v: String) =
      s"transform(sequence(1, $dim), j -> aggregate(sequence(1, $dim)," +
        s" CAST(0.0 AS DOUBLE), (a, i) -> a + element_at($v, i)" +
        s" * element_at(cm, (i - 1) * $dim + j)))"
    val top = flat.crossJoin(broadcast(nVec))
      .withColumn("mu", expr(
        "transform(mv, m -> CAST(m AS DOUBLE)" +
          " / (CAST(n_vec AS DOUBLE) * 1048576.0))"))
      // centered covariance from the exact integer sums; bind cm as
      // a VALUE before the fold reads it (the e_pca_power collapse
      // trap — element_at over a non-materialized projection
      // re-inlines the whole build per access)
      .withColumn("cm", expr(
        s"""transform(sequence(1, ${dim * dim}), k ->
           |  CAST(element_at(gflat, k) AS DOUBLE)
           |    / (CAST(n_vec AS DOUBLE) * 1099511627776.0)
           |  - element_at(mu, CAST(((k - 1) div $dim) + 1 AS INT))
           |    * element_at(mu, ((k - 1) % $dim) + 1))""".stripMargin))
      .localCheckpoint(eager = false)
      .withColumn("vf", expr(
        s"""aggregate(
           |  sequence(1, 12),
           |  array_repeat(CAST(0.125 AS DOUBLE), $dim),
           |  (v, it) -> aggregate(array(0), ${matvec("v")},
           |    (wv, z) -> transform(wv, x -> x / sqrt(aggregate(wv,
           |      CAST(0.0 AS DOUBLE), (a, y) -> a + y * y)))))""".stripMargin))
      .localCheckpoint(eager = false)
      .withColumn("wf", expr(matvec("vf")))
      .withColumn("lam", expr(
        s"aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE)," +
          s" (a, j) -> a + element_at(vf, j) * element_at(wf, j))"))
      .withColumn("trace", expr(
        s"aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE)," +
          s" (a, j) -> a + element_at(cm, (j - 1) * $dim + j))"))
      .select(col("n_vec"), col("mu"), col("vf"), col("lam"), col("trace"))
    // one corpus pass: raw unit vector AND the abtt unit vector
    val units = q.crossJoin(broadcast(top))
      .withColumn("eq", expr(
        "transform(qv, x -> CAST(x AS DOUBLE) / 1048576.0)"))
      .withColumn("nr", expr("sqrt(aggregate(eq, CAST(0.0 AS DOUBLE)," +
        " (a, x) -> a + x * x))"))
      .withColumn("un_raw", expr("transform(eq, x -> x / nr)"))
      .withColumn("cv", expr(
        s"transform(sequence(1, $dim)," +
          s" j -> element_at(eq, j) - element_at(mu, j))"))
      .withColumn("t", expr(
        s"aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE)," +
          s" (a, j) -> a + element_at(cv, j) * element_at(vf, j))"))
      .withColumn("pr", expr(
        s"transform(sequence(1, $dim)," +
          s" j -> element_at(cv, j) - t * element_at(vf, j))"))
      .withColumn("na", expr("sqrt(aggregate(pr, CAST(0.0 AS DOUBLE)," +
        " (a, x) -> a + x * x))"))
      .withColumn("un_abtt", expr("transform(pr, x -> x / na)"))
      .select(col("vec_id"), col("n_vec"), col("lam"), col("trace"),
        posexplode(arrays_zip(col("un_raw"), col("un_abtt")))
          .as(Seq("pos", "u")))
    val perDim = units.groupBy(col("pos"))
      .agg(max(col("n_vec")).as("n_vec"), max(col("lam")).as("lam"),
        max(col("trace")).as("trace"),
        expr("aggregate(sort_array(collect_list(struct(vec_id," +
          " u.un_raw))), 0D, (a, x) -> a + x.un_raw)").as("sr"),
        expr("aggregate(sort_array(collect_list(struct(vec_id," +
          " u.un_abtt))), 0D, (a, x) -> a + x.un_abtt)").as("sa"))
      .withColumn("mr", col("sr") / d(col("n_vec")))
      .withColumn("ma", col("sa") / d(col("n_vec")))
    perDim
      .agg(max(col("n_vec")).cast("long").as("n_vec"),
        max(col("lam")).as("lam"), max(col("trace")).as("trace"),
        expr("aggregate(sort_array(collect_list(struct(pos, mr * mr)))," +
          " 0D, (a, x) -> a + x.col2)").as("ar"),
        expr("aggregate(sort_array(collect_list(struct(pos, ma * ma)))," +
          " 0D, (a, x) -> a + x.col2)").as("aa"))
      .select(col("n_vec"),
        round(col("ar"), 6).as("anisotropy_raw"),
        round(col("aa"), 6).as("anisotropy_abtt"),
        round(col("aa") / col("ar"), 6).as("residual_ratio"),
        round(col("lam"), 6).as("pc1_eigenvalue"),
        round(col("lam") / col("trace"), 6).as("pc1_explained"))
  }

  // ---------------------------------------------------------------
  // ev_fano_dispersion — Fano factor F = Var/Mean of per-minute
  // arrivals per event type over the FULL observed span (Poisson ⇒
  // F = 1). Empty minutes are never materialized: with N span
  // minutes, T events and Σc² over occupied minutes only,
  // Var = (Σc² − T²/N)/(N−1) exactly. T, Σc², N are exact longs
  // (minute buckets via integer µs division); the χ² index
  // D = (N−1)·F with the normal approximation z = (D−(N−1))/√(2(N−1))
  // classifies over/under-dispersed at |z| > 1.96. Scale shape: one
  // map-side (type, minute) count, one (type) re-aggregate, a
  // broadcast scalar span — no window, no spine.
  // ---------------------------------------------------------------
  val evFanoDispersion: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 60000000").as("minute"))
    val perMin = ev.groupBy(col("event_type"), col("minute"))
      .agg(count(lit(1)).cast("long").as("c"))
    val span = ev.agg((max(col("minute")) - min(col("minute")) + 1L)
      .cast("long").as("n_min"))
    val st = perMin.groupBy(col("event_type"))
      .agg(sum(col("c")).cast("long").as("t"),
        sum(col("c") * col("c")).cast("long").as("sc2"),
        count(lit(1)).cast("long").as("n_occupied"))
      .crossJoin(broadcast(span))
    val mean = d(col("t")) / d(col("n_min"))
    val vr = (d(col("sc2")) - d(col("t")) * d(col("t")) / d(col("n_min"))) /
      d(col("n_min") - 1L)
    val fano = vr / mean
    val z = (d(col("n_min") - 1L) * fano - d(col("n_min") - 1L)) /
      sqrt(lit(2.0) * d(col("n_min") - 1L))
    st.select(col("event_type"), col("n_min").as("n_minutes"),
      col("t").as("n_events"), col("n_occupied"),
      round(mean, 6).as("mean_per_min"),
      round(fano, 6).as("fano"),
      round(z, 6).as("z"),
      when(z > 1.96, "overdispersed").when(z < -1.96, "underdispersed")
        .otherwise("poisson_compatible").as("verdict"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "e_abtt_isotropy" -> eAbttIsotropy,
    "ev_fano_dispersion" -> evFanoDispersion)

  val oracles: Map[String, String] = Map(
    "e_abtt_isotropy" ->
      """WITH RECURSIVE q AS (
        |  SELECT vec_id, list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
        |           AS qv
        |  FROM embeddings),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM q),
        |ms AS (
        |  SELECT ti.i AS i, CAST(sum(qv[ti.i]) AS BIGINT) AS m
        |  FROM q, range(1, 65) ti(i) GROUP BY 1),
        |mut AS (
        |  SELECT list(CAST(m AS DOUBLE)
        |           / (CAST(nv.n_vec AS DOUBLE) * 1048576.0) ORDER BY i)
        |           AS mu
        |  FROM ms CROSS JOIN nv),
        |g AS (
        |  SELECT ti.i AS i, tj.j AS j,
        |         CAST(sum(qv[ti.i] * qv[tj.j]) AS BIGINT) AS s
        |  FROM q, range(1, 65) ti(i), range(1, 65) tj(j)
        |  GROUP BY 1, 2),
        |cmt AS (
        |  SELECT list(CAST(s AS DOUBLE)
        |           / (CAST(nv.n_vec AS DOUBLE) * 1099511627776.0)
        |           - mu[i] * mu[j]
        |           ORDER BY i, j) AS cm
        |  FROM g CROSS JOIN nv CROSS JOIN mut),
        |it(stp, v) AS (
        |  SELECT 0, list_transform(range(1, 65), x -> CAST(0.125 AS DOUBLE))
        |  UNION ALL
        |  SELECT stp + 1, list_transform(w, x -> x / nrm) FROM (
        |    SELECT stp, w,
        |           sqrt(list_sum(list_transform(w, x -> x * x))) AS nrm
        |    FROM (SELECT stp,
        |            list_transform(range(1, 65),
        |              j -> list_sum(list_transform(range(1, 65),
        |                i -> v[i] * cm[(i - 1) * 64 + j]))) AS w
        |          FROM it, cmt WHERE stp < 12))),
        |vf AS (SELECT v FROM it WHERE stp = 12),
        |fin AS (
        |  SELECT v,
        |         list_sum(list_transform(range(1, 65), j -> v[j] * w[j]))
        |           AS lam,
        |         list_sum(list_transform(range(1, 65),
        |           j -> cm[(j - 1) * 64 + j])) AS tr
        |  FROM (SELECT v, cm,
        |          list_transform(range(1, 65),
        |            j -> list_sum(list_transform(range(1, 65),
        |              i -> v[i] * cm[(i - 1) * 64 + j]))) AS w
        |        FROM vf, cmt)),
        |un AS (
        |  SELECT uq.vec_id,
        |         list_transform(eq, x -> x / nr) AS un_raw,
        |         list_transform(pr, x -> x / na) AS un_abtt
        |  FROM (
        |    SELECT vec_id, eq, nr, pr,
        |           sqrt(list_sum(list_transform(pr, x -> x * x))) AS na
        |    FROM (
        |      SELECT vec_id, eq, nr,
        |             list_transform(range(1, 65),
        |               j -> cv[j] - t * v[j]) AS pr
        |      FROM (
        |        SELECT vec_id, eq, nr, cv, v,
        |               list_sum(list_transform(range(1, 65),
        |                 j -> cv[j] * v[j])) AS t
        |        FROM (
        |          SELECT vec_id, eq,
        |                 sqrt(list_sum(list_transform(eq, x -> x * x)))
        |                   AS nr,
        |                 list_transform(range(1, 65), j -> eq[j] - mu[j])
        |                   AS cv,
        |                 v
        |          FROM (SELECT vec_id, list_transform(qv,
        |                  x -> CAST(x AS DOUBLE) / 1048576.0) AS eq
        |                FROM q), mut, vf)))) uq),
        |dimsum AS (
        |  SELECT tj.j AS pos,
        |         list_sum(list(un_raw[tj.j] ORDER BY vec_id)) AS sr,
        |         list_sum(list(un_abtt[tj.j] ORDER BY vec_id)) AS sa
        |  FROM un, range(1, 65) tj(j) GROUP BY 1),
        |anis AS (
        |  SELECT list_sum(list((sr / nv.n_vec) * (sr / nv.n_vec)
        |           ORDER BY pos)) AS ar,
        |         list_sum(list((sa / nv.n_vec) * (sa / nv.n_vec)
        |           ORDER BY pos)) AS aa
        |  FROM dimsum CROSS JOIN nv GROUP BY nv.n_vec)
        |SELECT nv.n_vec, round(anis.ar, 6) AS anisotropy_raw,
        |       round(anis.aa, 6) AS anisotropy_abtt,
        |       round(anis.aa / anis.ar, 6) AS residual_ratio,
        |       round(fin.lam, 6) AS pc1_eigenvalue,
        |       round(fin.lam / fin.tr, 6) AS pc1_explained
        |FROM anis, fin, nv""".stripMargin,
    "ev_fano_dispersion" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 60000000 AS minute
        |  FROM events),
        |pm AS (
        |  SELECT event_type, minute, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |sp AS (
        |  SELECT CAST(max(minute) - min(minute) + 1 AS BIGINT) AS n_min
        |  FROM ev),
        |st AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS t,
        |         CAST(sum(c * c) AS BIGINT) AS sc2,
        |         CAST(count(*) AS BIGINT) AS n_occupied
        |  FROM pm GROUP BY 1),
        |calc AS (
        |  SELECT event_type, n_min, t, n_occupied,
        |         CAST(t AS DOUBLE) / CAST(n_min AS DOUBLE) AS mean,
        |         ((CAST(sc2 AS DOUBLE) - CAST(t AS DOUBLE)
        |             * CAST(t AS DOUBLE) / CAST(n_min AS DOUBLE))
        |           / CAST(n_min - 1 AS DOUBLE))
        |           / (CAST(t AS DOUBLE) / CAST(n_min AS DOUBLE)) AS fano
        |  FROM st CROSS JOIN sp)
        |SELECT event_type, n_min AS n_minutes, t AS n_events, n_occupied,
        |       round(mean, 6) AS mean_per_min,
        |       round(fano, 6) AS fano,
        |       round((CAST(n_min - 1 AS DOUBLE) * fano
        |         - CAST(n_min - 1 AS DOUBLE))
        |         / sqrt(2.0 * CAST(n_min - 1 AS DOUBLE)), 6) AS z,
        |       CASE WHEN (CAST(n_min - 1 AS DOUBLE) * fano
        |                  - CAST(n_min - 1 AS DOUBLE))
        |                 / sqrt(2.0 * CAST(n_min - 1 AS DOUBLE)) > 1.96
        |            THEN 'overdispersed'
        |            WHEN (CAST(n_min - 1 AS DOUBLE) * fano
        |                  - CAST(n_min - 1 AS DOUBLE))
        |                 / sqrt(2.0 * CAST(n_min - 1 AS DOUBLE)) < -1.96
        |            THEN 'underdispersed'
        |            ELSE 'poisson_compatible' END AS verdict
        |FROM calc ORDER BY event_type""".stripMargin)
}
