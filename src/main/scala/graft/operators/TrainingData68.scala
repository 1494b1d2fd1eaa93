package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 68: HLL SET ALGEBRA — union/intersection estimates
  * across sketch pairs. The point at 100 TB: per-segment sketches are
  * built ONCE (64 ints each), and any cross-segment overlap question
  * is then answered from the sketches alone — register-wise max is
  * the union, inclusion–exclusion gives the intersection — without
  * ever re-scanning or joining the raw data. Same register machinery
  * as a_hll_registers (md5-derived, exact float DAG, linear-counting
  * branch), so the DuckDB oracle replays everything bit-for-bit
  * including the estimates' error against the exact unions.
  */
object TrainingData68 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_hll_set_algebra — for every ordered pair of order-priority
  // segments (grp_a < grp_b): exact distinct customers per side and
  // union, the sketch-union estimate (register-wise max of two
  // 64-register sketches), the inclusion–exclusion intersection
  // estimate, and the union estimate's relative error. Scale shape:
  // one register aggregate over the fact table, then everything
  // else is arithmetic on a ≤(segments choose 2) lattice of 64-int
  // vectors — the deliberate tiny cross (PlanSpec-allowlisted, the
  // sim_cosine_ivf shape); the exact-union audit joins the 10-row
  // pair lattice against the distinct (grp, custkey) projection as
  // a broadcast filter pass, one scan.
  // ---------------------------------------------------------------
  private val M = 64
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  /** Full 64-register vector per group (missing registers → 0). */
  private def regVectors(base: DataFrame): DataFrame =
    base.groupBy(col("grp"), col("reg"))
      .agg(max(col("rnk")).as("mx"))
      .groupBy(col("grp"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("reg"), col("mx"))))).as("rm"))
      .select(col("grp"),
        expr(s"transform(sequence(0, ${M - 1})," +
          " j -> coalesce(element_at(rm, j), 0))").as("regs"))

  /** The batch op's exact estimate DAG: index-order harmonic fold,
    * linear-counting small-range branch. */
  private def estimate(vec: Column): Column = {
    val z = aggregate(vec, lit(0.0),
      (acc, m) => acc + pow(lit(0.5), d(m)))
    val v = size(filter(vec, m => m === 0))
    val raw = lit(Alpha) * lit(M.toDouble * M) / z
    when(raw <= lit(2.5 * M) && v > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / d(v))).otherwise(raw)
  }

  val aHllSetAlgebra: Q = (s, dir) => {
    val base = TrainingData21.hllBase(s, dir).localCheckpoint(eager = false)
    val vecs = regVectors(base).localCheckpoint(eager = false) // both lattice sides
    val pairs = vecs.select(col("grp").as("grp_a"), col("regs").as("ra"))
      .crossJoin(vecs.select(col("grp").as("grp_b"), col("regs").as("rb")))
      .filter(col("grp_a") < col("grp_b"))
      .withColumn("ru", zip_with(col("ra"), col("rb"),
        (a, b) => greatest(a, b)))
      .select(col("grp_a"), col("grp_b"),
        estimate(col("ra")).as("est_a"), estimate(col("rb")).as("est_b"),
        estimate(col("ru")).as("est_union"))
    // exact audit: distinct members once, then a broadcast pair
    // filter — one pass over the projection, never a pair×fact join
    val members = base.select(col("grp"), col("o_custkey")).distinct()
    val exactUnion = broadcast(pairs.select(col("grp_a"), col("grp_b")))
      .join(members, col("grp") === col("grp_a") ||
        col("grp") === col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(countDistinct(col("o_custkey")).cast("long").as("n_exact_union"))
    val exactSide = members.groupBy(col("grp"))
      .agg(countDistinct(col("o_custkey")).cast("long").as("n"))
    pairs
      .join(exactUnion, Seq("grp_a", "grp_b"))
      .join(exactSide.select(col("grp").as("grp_a"), col("n").as("n_exact_a")),
        "grp_a")
      .join(exactSide.select(col("grp").as("grp_b"), col("n").as("n_exact_b")),
        "grp_b")
      .select(col("grp_a"), col("grp_b"),
        col("n_exact_a"), col("n_exact_b"), col("n_exact_union"),
        round(col("est_union"), 6).as("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 6)
          .as("est_intersect"),
        round(abs(col("est_union") - d(col("n_exact_union"))) /
          d(col("n_exact_union")), 6).as("union_rel_error"))
      .orderBy(col("grp_a"), col("grp_b"))
  }

  val queries: Map[String, Q] = Map(
    "a_hll_set_algebra" -> aHllSetAlgebra)

  private def hexN(expr0: String, from: Int, len: Int): String =
    s"list_reduce(list_transform(string_split(substr(md5($expr0), $from, " +
      s"$len), ''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      " (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "a_hll_set_algebra" -> {
      val w13 = "substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13)"
      val nib = s"CAST(strpos('0123456789abcdef', substr($w13, " +
        s"length(regexp_extract($w13, '^(0*)', 1)) + 1, 1)) - 1 AS INT)"
      s"""WITH rows_ AS (
         |  SELECT o_orderpriority AS grp, o_custkey,
         |         CAST(${hexN("CAST(o_custkey AS VARCHAR)", 14, 2)} % 64
         |           AS INT) AS reg,
         |         CAST(length(regexp_extract($w13, '^(0*)', 1)) * 4
         |           + (4 - CASE WHEN $nib >= 8 THEN 4
         |                       WHEN $nib >= 4 THEN 3
         |                       WHEN $nib >= 2 THEN 2
         |                       WHEN $nib >= 1 THEN 1
         |                       ELSE 0 END) + 1 AS INT) AS rnk
         |  FROM orders),
         |regs AS (
         |  SELECT grp, reg, max(rnk) AS mx FROM rows_ GROUP BY 1, 2),
         |lattice AS (
         |  SELECT g.grp, CAST(j.j AS INT) AS j, coalesce(r.mx, 0) AS m
         |  FROM (SELECT DISTINCT grp FROM regs) g
         |  CROSS JOIN range(0, 64) j(j)
         |  LEFT JOIN regs r ON r.grp = g.grp AND r.reg = j.j),
         |pairsj AS (
         |  SELECT a.grp AS grp_a, b.grp AS grp_b, a.j,
         |         a.m AS ma, b.m AS mb, greatest(a.m, b.m) AS mu
         |  FROM lattice a JOIN lattice b
         |    ON a.j = b.j AND a.grp < b.grp),
         |folded AS (
         |  SELECT grp_a, grp_b,
         |         list_sum(list(0.5 ^ CAST(ma AS DOUBLE) ORDER BY j)) AS za,
         |         CAST(sum(CASE WHEN ma = 0 THEN 1 ELSE 0 END) AS BIGINT) AS va,
         |         list_sum(list(0.5 ^ CAST(mb AS DOUBLE) ORDER BY j)) AS zb,
         |         CAST(sum(CASE WHEN mb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS vb,
         |         list_sum(list(0.5 ^ CAST(mu AS DOUBLE) ORDER BY j)) AS zu,
         |         CAST(sum(CASE WHEN mu = 0 THEN 1 ELSE 0 END) AS BIGINT) AS vu
         |  FROM pairsj GROUP BY 1, 2),
         |est AS (
         |  SELECT grp_a, grp_b,
         |         CASE WHEN (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / za
         |                <= 160.0 AND va > 0
         |              THEN 64.0 * ln(64.0 / CAST(va AS DOUBLE))
         |              ELSE (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / za END AS ea,
         |         CASE WHEN (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / zb
         |                <= 160.0 AND vb > 0
         |              THEN 64.0 * ln(64.0 / CAST(vb AS DOUBLE))
         |              ELSE (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / zb END AS eb,
         |         CASE WHEN (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / zu
         |                <= 160.0 AND vu > 0
         |              THEN 64.0 * ln(64.0 / CAST(vu AS DOUBLE))
         |              ELSE (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / zu END AS eu
         |  FROM folded),
         |members AS (
         |  SELECT DISTINCT o_orderpriority AS grp, o_custkey FROM orders),
         |ex_side AS (
         |  SELECT grp, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n
         |  FROM members GROUP BY 1),
         |ex_union AS (
         |  SELECT e.grp_a, e.grp_b,
         |         CAST(count(DISTINCT m.o_custkey) AS BIGINT) AS n_exact_union
         |  FROM est e JOIN members m
         |    ON m.grp = e.grp_a OR m.grp = e.grp_b
         |  GROUP BY 1, 2)
         |SELECT e.grp_a, e.grp_b, sa.n AS n_exact_a, sb.n AS n_exact_b,
         |       u.n_exact_union,
         |       round(e.eu, 6) AS est_union,
         |       round(e.ea + e.eb - e.eu, 6) AS est_intersect,
         |       round(abs(e.eu - CAST(u.n_exact_union AS DOUBLE))
         |         / CAST(u.n_exact_union AS DOUBLE), 6) AS union_rel_error
         |FROM est e
         |JOIN ex_union u ON u.grp_a = e.grp_a AND u.grp_b = e.grp_b
         |JOIN ex_side sa ON sa.grp = e.grp_a
         |JOIN ex_side sb ON sb.grp = e.grp_b
         |ORDER BY e.grp_a, e.grp_b""".stripMargin
    })
}
