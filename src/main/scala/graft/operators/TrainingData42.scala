package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 37: partial autocorrelation via the Durbin–Levinson
  * recursion (Box & Jenkins — the AR-order diagnostic the plain ACF
  * can't give), a product-quantization subspace audit (which of the
  * 8 PQ subspaces burns the distortion budget / wastes its code
  * space), and a language-ID confusion matrix with per-class
  * precision/recall/F1 (the eval every heuristic classifier gate
  * ships with). All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData42 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_pacf — PACF of daily revenue at lags 1..7 via Durbin–Levinson:
  //   φ₁₁ = ρ₁;  φ_kk = (ρ_k − Σⱼ φ_{k−1,j} ρ_{k−j}) /
  //                     (1 − Σⱼ φ_{k−1,j} ρ_j);
  //   φ_kj = φ_{k−1,j} − φ_kk φ_{k−1,k−j}
  // The recursion is FIXED-DEPTH (k ≤ 7), so it unrolls at plan-
  // build time into one scalar expression DAG over the 8-value
  // autocovariance frame — no iteration, no driver data. The same
  // unroll (same j-ascending addition order) generates the oracle
  // SQL from one recurrence printer, so the two engines share the
  // arithmetic text exactly. Scale shape: the corpus reduces to the
  // calendar-bounded daily series; one 7-lag window pass over it
  // (documented low-cardinality family); γ_k fold in pinned day
  // order (null lags contribute +0.0); outputs round-6.
  // ---------------------------------------------------------------
  private val PacfLags = 7

  val wPacf: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
    val n = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(col("m")).cast("long").as("sm"))
      .withColumn("mu", d(col("sm")) / d(col("n")))
    val w = Grain.bounded(col("day"))
    val lagged = (1 to PacfLags).foldLeft(
      daily.crossJoin(broadcast(n.select(col("mu"), col("n"))))) {
      (df, k) => df.withColumn(s"l$k", lag(col("m"), k).over(w))
    }
    def gammaTerm(k: Int): Column =
      if (k == 0) (d(col("m")) - col("mu")) * (d(col("m")) - col("mu"))
      else when(col(s"l$k").isNotNull,
        (d(col("m")) - col("mu")) * (d(col(s"l$k")) - col("mu")))
        .otherwise(lit(0.0))
    val terms = lagged.select(col("day") +: col("n") +:
      (0 to PacfLags).map(k => gammaTerm(k).as(s"g$k")): _*)
    val gam = terms.groupBy(col("n"))
      .agg((0 to PacfLags).map(k =>
        expr(s"aggregate(sort_array(collect_list(struct(day, g$k))), 0D," +
          s" (a, x) -> a + x.g$k)").as(s"gam$k")).head,
        (0 to PacfLags).map(k =>
          expr(s"aggregate(sort_array(collect_list(struct(day, g$k))), 0D," +
            s" (a, x) -> a + x.g$k)").as(s"gam$k")).tail: _*)
    val withRho = (1 to PacfLags).foldLeft(gam) { (df, k) =>
      df.withColumn(s"rho$k", col(s"gam$k") / col("gam0"))
    }
    // unrolled Durbin–Levinson, one MATERIALIZED level per k: naive
    // Column substitution re-inlines φ_{k−1,·} into every reference
    // (CollapseProject undoes any column sharing), and the tree
    // grows ~4^k — at k=7 plan compilation alone measured 23 s. A
    // localCheckpoint per level (a ONE-ROW frame — microseconds)
    // freezes each level's doubles as scanned columns, so level k
    // references values, not expression trees; the arithmetic and
    // its order are unchanged, hence bit-identical to the oracle's
    // fully-expanded text.
    var cur = withRho.withColumn("p_1_1", col("rho1")).localCheckpoint(eager = false)
    for (k <- 2 to PacfLags) {
      val num = (1 until k).foldLeft(col(s"rho$k")) { (acc, j) =>
        acc - col(s"p_${k - 1}_$j") * col(s"rho${k - j}")
      }
      val den = (1 until k).foldLeft(lit(1.0): Column) { (acc, j) =>
        acc - col(s"p_${k - 1}_$j") * col(s"rho$j")
      }
      cur = cur.withColumn(s"p_${k}_$k", num / den).localCheckpoint(eager = false)
      cur = cur.select(col("*") +: (1 until k).map(j =>
        (col(s"p_${k - 1}_$j") - col(s"p_${k}_$k") * col(s"p_${k - 1}_${k - j}"))
          .as(s"p_${k}_$j")): _*)
        .localCheckpoint(eager = false)
    }
    val out = cur.select(col("n") +:
      (1 to PacfLags).flatMap(k => Seq(
        round(col(s"rho$k"), 6).as(s"acf$k"),
        round(col(s"p_${k}_$k"), 6).as(s"pacf$k"))): _*)
    out.select(explode(array((1 to PacfLags).map(k =>
        struct(lit(k).cast("int").as("lag"), col(s"acf$k").as("acf"),
          col(s"pacf$k").as("pacf"))): _*)).as("r"))
      .select(col("r.lag"), col("r.acf"), col("r.pacf"))
      .orderBy(col("lag"))
  }

  // ---------------------------------------------------------------
  // e_pq_subspace_audit — per-subspace health of the e_pq_codes
  // codebook: mean encoding distortion, number of distinct codes
  // actually used (of 16), and the hottest code's share. A subspace
  // with 3 live codes or one code absorbing half the corpus is where
  // PQ recall dies (codebook imbalance — the FAISS "dead centroid"
  // pathology), and re-training budget should go there first. Scale
  // shape: inherits e_pq_codes' broadcast-codebook encode (corpus
  // maps through one explode(8)+join pass); the audit is an 8-group
  // aggregate; distortion folds in vec_id order per subspace (plain
  // sum at real scale — the documented deviation class).
  // ---------------------------------------------------------------
  val ePqSubspaceAudit: Q = (s, dir) => {
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
      .localCheckpoint(eager = false) // consumed by seeds AND the encode pass
    val subsOf = (df: DataFrame) => df.select(col("vec_id"), col("e"),
      posexplode(transform(sequence(lit(0), lit(7)),
        mm => slice(col("e"), mm * lit(8) + 1, lit(8)))).as(Seq("m", "sub")))
    val seeds = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .withColumn("cid", row_number().over(
        Grain.bounded(md5(col("vec_id").cast("string")), col("vec_id"))))
    val cent = subsOf(seeds.select(col("cid").cast("long").as("vec_id"), col("e")))
      .select(col("vec_id").as("cid"), col("m"), col("sub").as("ce"))
    val best = subsOf(emb)
      .join(broadcast(cent), "m")
      .withColumn("dist", expr(
        "aggregate(zip_with(sub, ce, (a, b) -> (a - b) * (a - b)), 0D," +
          " (s, v) -> s + v)"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist").as("dist"), col("cid").as("cid"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.cid").as("code"),
        col("best.dist").as("dist"))
      .localCheckpoint(eager = false) // stats leg AND hot-code leg
    val stats = best.groupBy(col("m"))
      .agg(count(lit(1)).cast("long").as("n_vectors"),
        countDistinct(col("code")).cast("long").as("n_codes_used"),
        expr("aggregate(sort_array(collect_list(struct(vec_id, dist))), 0D," +
          " (a, x) -> a + x.dist)").as("sd"))
    val hot = best.groupBy(col("m"), col("code"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("m"))
      .agg(max(struct(col("c").as("c"), (-col("code")).as("neg"))).as("top"))
      .select(col("m"), col("top.c").as("top_count"),
        (-col("top.neg")).cast("long").as("top_code"))
    stats.join(hot, Seq("m"))
      .select(col("m").cast("long").as("subspace"), col("n_vectors"),
        col("n_codes_used"), col("top_code"),
        round(d(col("top_count")) / d(col("n_vectors")), 6).as("top_code_share"),
        round(col("sd") / d(col("n_vectors")), 6).as("mean_dist"))
      .orderBy(col("subspace"))
  }

  // ---------------------------------------------------------------
  // t_langid_confusion — the heuristic language classifier
  // (TF.langId) evaluated against the labeled lang column: per-class
  // precision, recall, and F1 from the exact confusion counts — the
  // shipping gate for any filter that routes documents by predicted
  // language. Scale shape: one scan computes predictions in codegen,
  // one shuffle on the bounded (lang × predicted) key; the per-class
  // margins are broadcast-joined bounded frames; every metric is
  // integer counts through fixed divisions.
  // ---------------------------------------------------------------
  val tLangidConfusion: Q = (s, dir) => {
    val pred = Tables.table(s, dir, "documents")
      .select(col("lang"), TF.langId(col("text")).as("predicted"))
      .localCheckpoint(eager = false) // diagonal, row margins, column margins
    val diag = pred.filter(col("lang") === col("predicted"))
      .groupBy(col("lang")).agg(count(lit(1)).cast("long").as("tp"))
    val actual = pred.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_actual"))
    val predicted = pred.groupBy(col("predicted").as("lang"))
      .agg(count(lit(1)).cast("long").as("n_predicted"))
    actual.join(predicted, Seq("lang"), "full_outer")
      .join(diag, Seq("lang"), "left")
      .na.fill(0L, Seq("n_actual", "n_predicted", "tp"))
      .withColumn("precision",
        when(col("n_predicted") > 0,
          round(d(col("tp")) / d(col("n_predicted")), 6)))
      .withColumn("recall",
        when(col("n_actual") > 0, round(d(col("tp")) / d(col("n_actual")), 6)))
      .withColumn("f1",
        when(col("n_predicted") + col("n_actual") > 0,
          round(lit(2.0) * d(col("tp")) /
            d(col("n_predicted") + col("n_actual")), 6)))
      .select(col("lang"), col("n_actual"), col("n_predicted"), col("tp"),
        col("precision"), col("recall"), col("f1"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "w_pacf" -> wPacf,
    "e_pq_subspace_audit" -> ePqSubspaceAudit,
    "t_langid_confusion" -> tLangidConfusion)

  /** The same Durbin–Levinson unroll as the engine, printed as SQL
    * text — one recurrence generator feeds both engines, so the
    * addition order is identical by construction. */
  private def pacfSqlExprs: Seq[(Int, String)] = {
    val phi = scala.collection.mutable.Map[(Int, Int), String]()
    phi((1, 1)) = "rho1"
    for (k <- 2 to PacfLags) {
      val num = (1 until k).foldLeft(s"rho$k") { (acc, j) =>
        s"($acc - ${phi((k - 1, j))} * rho${k - j})"
      }
      val den = (1 until k).foldLeft("1.0") { (acc, j) =>
        s"($acc - ${phi((k - 1, j))} * rho$j)"
      }
      phi((k, k)) = s"($num / $den)"
      for (j <- 1 until k)
        phi((k, j)) = s"(${phi((k - 1, j))} - ${phi((k, k))} * ${phi((k - 1, k - j))})"
    }
    (1 to PacfLags).map(k => k -> phi((k, k)))
  }

  val oracles: Map[String, String] = Map(
    "w_pacf" -> {
      val gammaCols = (0 to PacfLags).map { k =>
        val term =
          if (k == 0) "(m::DOUBLE - mu) * (m::DOUBLE - mu)"
          else s"CASE WHEN l$k IS NOT NULL THEN (m::DOUBLE - mu)" +
            s" * (l$k::DOUBLE - mu) ELSE 0.0 END"
        s"list_sum(list($term ORDER BY day)) AS gam$k"
      }.mkString(",\n         ")
      val lagCols = (1 to PacfLags)
        .map(k => s"lag(m, $k) OVER (ORDER BY day) AS l$k").mkString(",\n         ")
      val rhoCols = (1 to PacfLags)
        .map(k => s"gam$k / gam0 AS rho$k").mkString(", ")
      val pacfRows = pacfSqlExprs.map { case (k, e) =>
        s"  SELECT CAST($k AS INTEGER) AS lag, round(rho$k, 6) AS acf," +
          s" round($e, 6) AS pacf FROM rho"
      }.mkString("\n  UNION ALL\n")
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day,
         |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |           AS BIGINT)) AS BIGINT) AS m
         |  FROM orders GROUP BY 1),
         |nn AS (
         |  SELECT CAST(sum(m) AS BIGINT)::DOUBLE
         |           / CAST(count(*) AS BIGINT)::DOUBLE AS mu
         |  FROM daily),
         |lagged AS (
         |  SELECT day, m, mu,
         |         $lagCols
         |  FROM daily CROSS JOIN nn),
         |gam AS (
         |  SELECT $gammaCols
         |  FROM lagged),
         |rho AS (SELECT $rhoCols FROM gam)
         |SELECT lag, acf, pacf FROM (
         |$pacfRows)
         |ORDER BY lag""".stripMargin
    },
    "e_pq_subspace_audit" ->
      """WITH e0 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |seeds AS (
        |  SELECT CAST(rn AS BIGINT) AS cid, e
        |  FROM (SELECT vec_id, e,
        |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |        FROM e0)
        |  WHERE rn <= 16),
        |cent AS (
        |  SELECT cid, mm AS m, e[mm * 8 + 1:mm * 8 + 8] AS ce
        |  FROM seeds CROSS JOIN (SELECT unnest(range(0, 8)) AS mm)),
        |subs AS (
        |  SELECT vec_id, mm AS m, e[mm * 8 + 1:mm * 8 + 8] AS sub
        |  FROM e0 CROSS JOIN (SELECT unnest(range(0, 8)) AS mm)),
        |best AS (
        |  SELECT vec_id, m,
        |         min({'dist': dist, 'cid': cid}) AS best
        |  FROM (
        |    SELECT s.vec_id, s.m, c.cid,
        |           list_sum(list_transform(range(1, len(s.sub) + 1),
        |             i -> (s.sub[i] - c.ce[i]) * (s.sub[i] - c.ce[i]))) AS dist
        |    FROM subs s JOIN cent c ON c.m = s.m)
        |  GROUP BY 1, 2),
        |bd AS (
        |  SELECT vec_id, m, best.cid AS code, best.dist AS dist FROM best),
        |stats AS (
        |  SELECT m, CAST(count(*) AS BIGINT) AS n_vectors,
        |         CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used,
        |         list_sum(list(dist ORDER BY vec_id)) AS sd
        |  FROM bd GROUP BY 1),
        |hot AS (
        |  SELECT m, max({'c': c, 'neg': -code}) AS top
        |  FROM (SELECT m, code, CAST(count(*) AS BIGINT) AS c
        |        FROM bd GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT CAST(s.m AS BIGINT) AS subspace, s.n_vectors, s.n_codes_used,
        |       CAST(-h.top.neg AS BIGINT) AS top_code,
        |       round(h.top.c::DOUBLE / s.n_vectors::DOUBLE, 6)
        |         AS top_code_share,
        |       round(s.sd / s.n_vectors::DOUBLE, 6) AS mean_dist
        |FROM stats s JOIN hot h ON h.m = s.m
        |ORDER BY subspace""".stripMargin,
    "t_langid_confusion" -> {
      // the TF.langId heuristic replayed in SQL (marker-hit argmax,
      // score-desc + first-lang tiebreak — the t_langid oracle's form)
      val langIdSql =
        """(SELECT l FROM (VALUES
          |     ('de', len(list_filter(toks, t -> t IN ('der','die','und','ist','das','nicht')))),
          |     ('en', len(list_filter(toks, t -> t IN ('the','and','of','to','is','in')))),
          |     ('es', len(list_filter(toks, t -> t IN ('el','la','de','que','los','una')))),
          |     ('fr', len(list_filter(toks, t -> t IN ('le','la','et','les','des','est')))),
          |     ('pt', len(list_filter(toks, t -> t IN ('o','a','de','que','não','uma'))))
          |   ) s(l, sc) ORDER BY sc DESC, l LIMIT 1)""".stripMargin
      s"""WITH pred AS (
         |  SELECT lang, $langIdSql AS predicted
         |  FROM (SELECT lang, string_split_regex(lower(text), '\\s+') AS toks
         |        FROM documents)),
         |diag AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS tp
         |  FROM pred WHERE lang = predicted GROUP BY 1),
         |act AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_actual
         |  FROM pred GROUP BY 1),
         |prd AS (
         |  SELECT predicted AS lang, CAST(count(*) AS BIGINT) AS n_predicted
         |  FROM pred GROUP BY 1)
         |SELECT coalesce(a.lang, p.lang) AS lang,
         |       coalesce(a.n_actual, 0) AS n_actual,
         |       coalesce(p.n_predicted, 0) AS n_predicted,
         |       coalesce(d.tp, 0) AS tp,
         |       CASE WHEN coalesce(p.n_predicted, 0) > 0 THEN
         |         round(coalesce(d.tp, 0)::DOUBLE / p.n_predicted::DOUBLE, 6)
         |       END AS precision,
         |       CASE WHEN coalesce(a.n_actual, 0) > 0 THEN
         |         round(coalesce(d.tp, 0)::DOUBLE / a.n_actual::DOUBLE, 6)
         |       END AS recall,
         |       CASE WHEN coalesce(p.n_predicted, 0)
         |              + coalesce(a.n_actual, 0) > 0 THEN
         |         round(2.0 * coalesce(d.tp, 0)::DOUBLE
         |           / (coalesce(p.n_predicted, 0)
         |              + coalesce(a.n_actual, 0))::DOUBLE, 6)
         |       END AS f1
         |FROM act a
         |FULL OUTER JOIN prd p ON p.lang = a.lang
         |LEFT JOIN diag d ON d.lang = coalesce(a.lang, p.lang)
         |ORDER BY lang""".stripMargin
    })
}
