package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-11 batch 77: cluster-validity indices over the registered
  * k-means clustering, and two representation-geometry audits.
  *
  *  - sim_davies_bouldin — Davies–Bouldin index (1979): per-cluster
  *    scatter vs between-centroid separation; the "are my clusters
  *    actually separated" number a curation pipeline checks before
  *    trusting cluster-balanced sampling.
  *  - sim_calinski_harabasz — Calinski–Harabasz variance-ratio
  *    criterion (1974) on the same clustering.
  *  - e_matryoshka_cka — linear CKA (Kornblith et al. 2019) between
  *    the full 64-dim embedding and its 8/16/32-dim Matryoshka
  *    prefixes, all off ONE exact quantized Gram: how much of the
  *    representation survives truncation (the sibling of
  *    sim_matryoshka_recall, which measures retrieval agreement —
  *    this measures subspace agreement).
  *  - e_jl_distortion — Johnson–Lindenstrauss audit: a deterministic
  *    md5-seeded ±1 sign projection to 16 dims, squared-distance
  *    distortion measured on the registered k-NN edge set.
  *
  * Float policy: exact integer/quantized moments wherever a fold
  * crosses the corpus; bounded (k², d², edge-set) folds run in
  * pinned sort order; libm-touched outputs round-6.
  */
object TrainingData77 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  // ---------------------------------------------------------------
  // sim_davies_bouldin — DB = mean_i max_{j≠i} (S_i + S_j) / M_ij.
  // Members are unit vectors, so the member→centroid Euclidean
  // distance needs no per-pair dot: d² = 1 − 2·cos + ‖c‖² with cos
  // the assignment's stored dot product. Per-cluster scatter folds
  // members vec_id-ascending (the kmeans member-fold policy);
  // centroid separations are a k×k broadcast cross (64 pairs at any
  // corpus size). Output: one row per cluster (scatter, worst
  // same-vs-separated ratio, the cluster it collides with) plus the
  // corpus DB index repeated — the per-cluster view is what tells
  // you WHICH cluster to split.
  // ---------------------------------------------------------------
  val simDaviesBouldin: Q = (s, dir) => {
    val (assign0, cents) = TrainingData4.kmeansAssignCents(s, dir)
    val assign = assign0.localCheckpoint(eager = false) // scatter + membership counts
    val cnorm = cents
      .select(col("cid"), col("ce"),
        Similarity.dot(col("ce"), col("ce")).as("cn2"))
      .localCheckpoint(eager = false) // feeds scatter, pairwise M, and the join-back
    val scat = assign.join(broadcast(cnorm.select(col("cid"), col("cn2"))), "cid")
      .select(col("cid"), col("vec_id"),
        sqrt(greatest(lit(0.0),
          lit(1.0) - lit(2.0) * col("cos") + col("cn2"))).as("dist"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).cast("long").as("n_members"),
        expr("aggregate(sort_array(collect_list(struct(vec_id, dist))), 0D," +
          " (a, q) -> a + q.dist)").as("sd"))
      .select(col("cid"), col("n_members"),
        (col("sd") / d(col("n_members"))).as("s"))
    val a = cnorm.alias("a"); val b = cnorm.alias("b")
    val sep = a.join(broadcast(b),
        col("a.cid") =!= col("b.cid"))
      .select(col("a.cid").as("cid"), col("b.cid").as("cid_other"),
        sqrt(greatest(lit(0.0), col("a.cn2") + col("b.cn2") -
          lit(2.0) * Similarity.dot(col("a.ce"), col("b.ce")))).as("m"))
    val si = scat.select(col("cid").as("ci"), col("n_members"),
      col("s").as("s_i"))
    val sj = scat.select(col("cid").as("cj"), col("s").as("s_j"))
    val ratios = sep
      .join(broadcast(si), col("cid") === col("ci"))
      .join(broadcast(sj), col("cid_other") === col("cj"))
      .select(col("cid"), col("cid_other"), col("n_members"),
        col("s_i").as("s"), ((col("s_i") + col("s_j")) / col("m")).as("r"))
    val perC = ratios.groupBy(col("cid"), col("n_members"), col("s"))
      .agg(max(struct(col("r").as("r"), (-col("cid_other")).as("neg"))).as("top"))
      .select(col("cid").as("cluster"), col("n_members"),
        col("s").as("scatter"), col("top.r").as("r_max"),
        (-col("top.neg")).cast("long").as("worst_neighbor"))
    val dbi = perC.agg((expr("aggregate(sort_array(collect_list(" +
        "struct(cluster, r_max))), 0D, (a, q) -> a + q.r_max)") /
        d(count(lit(1)))).as("db_index"))
    perC.crossJoin(broadcast(dbi))
      .select(col("cluster"), col("n_members"),
        round(col("scatter"), 6).as("scatter"),
        round(col("r_max"), 6).as("r_max"),
        col("worst_neighbor"),
        round(col("db_index"), 6).as("db_index"))
      .orderBy(col("cluster"))
  }

  // ---------------------------------------------------------------
  // sim_calinski_harabasz — CH = (SSB/(k−1)) / (SSW/(n−k)). SSW
  // reuses the assignment's stored dot: Σ(1 − 2cos + ‖c‖²), folded
  // cid-then-vec_id ascending. The global mean x̄ comes from EXACT
  // 2⁻²⁰-quantized component sums (the e_pca_power discipline) — a
  // corpus-scale mean with no order-sensitive float fold. SSB =
  // Σ_i n_i‖c_i − x̄‖² folds the k-row centroid frame.
  // ---------------------------------------------------------------
  val simCalinskiHarabasz: Q = (s, dir) => {
    val (assign0, cents) = TrainingData4.kmeansAssignCents(s, dir)
    val assign = assign0.localCheckpoint(eager = false)
    val cnorm = cents
      .select(col("cid"), col("ce"),
        Similarity.dot(col("ce"), col("ce")).as("cn2"))
    val ssw = assign.join(broadcast(cnorm.select(col("cid"), col("cn2"))), "cid")
      .select(col("cid"), col("vec_id"),
        greatest(lit(0.0),
          lit(1.0) - lit(2.0) * col("cos") + col("cn2")).as("d2"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).cast("long").as("n_members"),
        expr("aggregate(sort_array(collect_list(struct(vec_id, d2))), 0D," +
          " (a, q) -> a + q.d2)").as("sw"))
      .localCheckpoint(eager = false) // feeds the SSW fold AND the SSB join
    // exact quantized global mean of the NORMALIZED vectors
    val qsums = assign
      .select(posexplode(expr(
        "transform(e, x -> CAST(floor(x * 1048576.0) AS BIGINT))"))
        .as(Seq("pos", "qx")))
      .groupBy(col("pos"))
      .agg(sum(col("qx")).cast("long").as("sq"),
        count(lit(1)).cast("long").as("n"))
      .select(col("pos"),
        (d(col("sq")) / d(col("n")) / lit(1048576.0)).as("xbar"))
    val mean = qsums
      .agg(expr("transform(sort_array(collect_list(struct(pos, xbar)))," +
        " q -> q.xbar)").as("xb"))
    val ssb = ssw.select(col("cid"), col("n_members"))
      .join(broadcast(cnorm.select(col("cid"), col("ce"))), "cid")
      .crossJoin(broadcast(mean))
      .select(col("cid"), (d(col("n_members")) *
        expr("aggregate(zip_with(ce, xb, (c, m) -> (c - m) * (c - m)), 0D," +
          " (a, v) -> a + v)")).as("b"))
      .agg(expr("aggregate(sort_array(collect_list(struct(cid, b))), 0D," +
        " (a, q) -> a + q.b)").as("ssb"))
    val tot = ssw.agg(
      sum(col("n_members")).cast("long").as("n"),
      count(lit(1)).cast("long").as("k"),
      expr("aggregate(sort_array(collect_list(struct(cid, sw))), 0D," +
        " (a, q) -> a + q.sw)").as("ssw"))
    tot.crossJoin(broadcast(ssb))
      .select(col("n").as("n_vectors"), col("k").as("n_clusters"),
        round(col("ssb"), 6).as("ssb"),
        round(col("ssw"), 6).as("ssw"),
        round((col("ssb") / d(col("k") - 1L)) /
          (col("ssw") / d(col("n") - col("k"))), 6).as("ch_index"))
  }

  // ---------------------------------------------------------------
  // e_matryoshka_cka — one exact 64×64 quantized Gram G[i,j] =
  // Σ qx_i·qx_j plus component sums S[i]; every centered
  // cross-moment is then C[i,j] = G[i,j] − S[i]·S[j]/n (one double
  // expression per BOUNDED cell). Because a Matryoshka prefix IS a
  // coordinate subset, CKA(X, X[:p]) needs only sub-blocks:
  //   HSIC_xy = Σ_{i<64, j<p} C², HSIC_yy = Σ_{i,j<p} C²,
  //   CKA = HSIC_xy / √(HSIC_xx·HSIC_yy).
  // The corpus contributes ONE map-combining d²-cell integer
  // aggregate; everything downstream folds ≤4096 cells (i,j)-
  // ascending. Raw (un-normalized) embeddings — CKA is what the
  // downstream model sees before any norm convention.
  // ---------------------------------------------------------------
  private val CkaPrefixes = Seq(8, 16, 32)

  val eMatryoshkaCka: Q = (s, dir) => {
    val dim = 64
    val q = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0)" +
          " AS BIGINT))").as("qv"))
      .localCheckpoint(eager = false) // Gram pass + sum pass + count share one scan
    val ex = q.select(col("qv"), posexplode(col("qv")).as(Seq("i", "qi")))
    val gramAggs = (0 until dim).map(j =>
      sum(col("qi") * element_at(col("qv"), j + 1)).cast("long").as(s"g$j"))
    val gram = ex.groupBy(col("i")).agg(gramAggs.head, gramAggs.tail: _*)
      .select(col("i"), posexplode(array((0 until dim).map(j =>
        col(s"g$j")): _*)).as(Seq("j", "g")))
    val sums = ex.groupBy(col("i"))
      .agg(sum(col("qi")).cast("long").as("s"), count(lit(1)).cast("long").as("n"))
    val si = sums.select(col("i"), col("s").as("si"), col("n"))
    val sj = sums.select(col("i").as("j"), col("s").as("sj"))
    val cent = gram.join(broadcast(si), "i").join(broadcast(sj), "j")
      .select(col("i"), col("j"), col("n"),
        (d(col("g")) - d(col("si")) * d(col("sj")) / d(col("n"))).as("c"))
      .localCheckpoint(eager = false) // one bounded 4096-cell frame, three consumers
    def hsic(maxI: Int, maxJ: Int): Column =
      expr(s"aggregate(sort_array(collect_list(CASE WHEN i < $maxI AND" +
        s" j < $maxJ THEN named_struct('i', i, 'j', j, 'cc', c * c)" +
        " ELSE NULL END)), 0D, (a, q) -> a + q.cc)")
    val aggCols: Seq[Column] =
      Seq(first(col("n")).as("n"), hsic(dim, dim).as("hxx")) ++
        CkaPrefixes.map(p => hsic(dim, p).as(s"hxy$p")) ++
        CkaPrefixes.map(p => hsic(p, p).as(s"hyy$p"))
    val folds = cent.agg(aggCols.head, aggCols.tail: _*)
    folds.select(col("n").as("n_vectors"),
        explode(array(CkaPrefixes.map(p =>
          struct(lit(p).cast("long").as("prefix_dim"),
            (col(s"hxy$p") / sqrt(col("hxx") * col(s"hyy$p"))).as("cka"))): _*))
          .as("r"))
      .select(col("n_vectors"), col("r.prefix_dim").as("prefix_dim"),
        round(col("r.cka"), 6).as("cka"))
      .orderBy(col("prefix_dim"))
  }

  // ---------------------------------------------------------------
  // e_jl_distortion — sign-projection (Achlioptas 2003) to 16 dims:
  // R[i,k] = ±1/4 by the portable md5 parity of "jl{i}:{k}", so
  // engine and oracle build the SAME matrix with no shipped seed.
  // Distortion = ‖Rx − Ry‖²/‖x − y‖² measured on the registered
  // k-NN edges (the distances a retrieval stack actually uses);
  // zero-distance duplicate edges are excluded and counted. The
  // projection is a 1024-cell broadcast; per-vector work is one
  // bounded fold per output dim; the edge audit never touches
  // non-edge pairs. ε_JL = √(8·ln n / 16) is the classic bound at
  // which THIS k would hold whp — share_within reports how much
  // tighter real data sits.
  // ---------------------------------------------------------------
  val eJlDistortion: Q = (s, dir) => {
    val dProj = 16
    val (edges, assigned) = TrainingData2.knnEdgesWithAssigned(s, dir)
    // R is fully deterministic (md5 parity of "jl{i}:{k}"), so build
    // it DRIVER-SIDE as one flat 1024-double literal instead of a
    // 1024-row DataFrame: the former explode → broadcast join →
    // (vec_id, k) collect_list/sort fold → (vec_id) re-collect pushed
    // ~10M structs through two ObjectHashAggregates just to evaluate
    // a fixed matrix product. Per-vector transform/aggregate folds
    // keep the EXACT same summation order (i ascending per k — what
    // sort_array(struct(i, xr)) produced), so p is bit-identical;
    // java.security MD5 and Spark's md5() agree on every input.
    val md = java.security.MessageDigest.getInstance("MD5")
    def rVal(i: Int, k: Int): Double = {
      val h = md.digest(s"jl$i:$k".getBytes("UTF-8"))
      // first hex char is the high nibble of byte 0: 0-7 → +1/4
      if (((h(0) >> 4) & 0xf) < 8) 0.25 else -0.25
    }
    val rflat = array((0 until 64).flatMap(i =>
      (0 until dProj).map(k => lit(rVal(i, k)))): _*)
    val proj = assigned
      .withColumn("__r", rflat)
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${dProj - 1}), k ->
           |  aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE),
           |    (a, i) -> a + element_at(e, i + 1)
           |      * element_at(__r, i * $dProj + k + 1)))"""
          .stripMargin.replaceAll("\n", " ")).as("pv"))
      .localCheckpoint(eager = false) // both edge ends read it
    val ea = assigned.select(col("vec_id").as("src"), col("e").as("esrc"))
    val eb = assigned.select(col("vec_id").as("dst"), col("e").as("edst"))
    val pa = proj.select(col("vec_id").as("src"), col("pv").as("psrc"))
    val pb = proj.select(col("vec_id").as("dst"), col("pv").as("pdst"))
    val ed = edges.join(ea, "src").join(eb, "dst")
      .join(pa, "src").join(pb, "dst")
      .select(col("src"), col("dst"),
        expr("aggregate(zip_with(esrc, edst, (a, b) -> (a - b) * (a - b))," +
          " 0D, (s, v) -> s + v)").as("od2"),
        expr("aggregate(zip_with(psrc, pdst, (a, b) -> (a - b) * (a - b))," +
          " 0D, (s, v) -> s + v)").as("pd2"))
      .localCheckpoint(eager = false) // the excluded count + the ratio folds
    val used = ed.filter(col("od2") > 1e-12)
      .select(col("src"), col("dst"), (col("pd2") / col("od2")).as("ratio"))
    val nTot = ed.agg(count(lit(1)).cast("long").as("n_edges"))
    val nVec = assigned.agg(count(lit(1)).cast("long").as("nv"))
    used.agg(count(lit(1)).cast("long").as("n_used"),
        min(col("ratio")).as("mn"), max(col("ratio")).as("mx"),
        expr("aggregate(sort_array(collect_list(struct(src, dst, ratio)))," +
          " 0D, (a, q) -> a + q.ratio)").as("sr"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(nVec))
      .withColumn("eps_jl", sqrt(lit(8.0) * log(d(col("nv"))) / lit(16.0)))
      .crossJoin(broadcast(used.select(col("src"), col("dst"), col("ratio"))
        .crossJoin(broadcast(nVec))
        .filter(abs(col("ratio") - 1.0) <=
          sqrt(lit(8.0) * log(d(col("nv"))) / lit(16.0)))
        .agg(count(lit(1)).cast("long").as("n_within"))))
      .select(col("n_edges"), col("n_used"),
        (col("n_edges") - col("n_used")).cast("long").as("n_zero_excluded"),
        round(col("mn"), 6).as("min_ratio"),
        round(col("mx"), 6).as("max_ratio"),
        round(col("sr") / d(col("n_used")), 6).as("mean_ratio"),
        round(col("eps_jl"), 6).as("eps_jl"),
        round(d(col("n_within")) / d(col("n_used")), 6).as("share_within_eps"))
  }

  val queries: Map[String, Q] = Map(
    "sim_davies_bouldin" -> simDaviesBouldin,
    "sim_calinski_harabasz" -> simCalinskiHarabasz,
    "e_matryoshka_cka" -> eMatryoshkaCka,
    "e_jl_distortion" -> eJlDistortion)

  val oracles: Map[String, String] = Map(
    "sim_davies_bouldin" ->
      s"""WITH ${TrainingData4.kmeansCte},
         |cn AS (
         |  SELECT cid, ce, ${dotSql("ce", "ce")} AS cn2 FROM c1),
         |scat AS (
         |  SELECT a2.cid, CAST(count(*) AS BIGINT) AS n_members,
         |         list_sum(list(sqrt(greatest(0.0,
         |           1.0 - 2.0 * a2.cos + cn.cn2)) ORDER BY a2.vec_id))
         |           / CAST(count(*) AS DOUBLE) AS s
         |  FROM a2 JOIN cn ON a2.cid = cn.cid
         |  GROUP BY a2.cid, cn.cn2),
         |sep AS (
         |  SELECT a.cid AS cid, b.cid AS cid_other,
         |         sqrt(greatest(0.0, a.cn2 + b.cn2
         |           - 2.0 * ${dotSql("a.ce", "b.ce")})) AS m
         |  FROM cn a JOIN cn b ON a.cid <> b.cid),
         |ratios AS (
         |  SELECT sep.cid, sep.cid_other, si.n_members, si.s,
         |         (si.s + sj.s) / sep.m AS r
         |  FROM sep JOIN scat si ON sep.cid = si.cid
         |           JOIN scat sj ON sep.cid_other = sj.cid),
         |perc AS (
         |  SELECT cid, n_members, s, r, cid_other,
         |         row_number() OVER (PARTITION BY cid
         |           ORDER BY r DESC, cid_other) AS rk
         |  FROM ratios),
         |top AS (SELECT cid, n_members, s, r, cid_other
         |        FROM perc WHERE rk = 1),
         |dbi AS (
         |  SELECT list_sum(list(r ORDER BY cid))
         |    / CAST(count(*) AS DOUBLE) AS db_index
         |  FROM top)
         |SELECT t.cid AS cluster, t.n_members,
         |       round(t.s, 6) AS scatter, round(t.r, 6) AS r_max,
         |       CAST(t.cid_other AS BIGINT) AS worst_neighbor,
         |       round(d.db_index, 6) AS db_index
         |FROM top t CROSS JOIN dbi d
         |ORDER BY cluster""".stripMargin,
    "sim_calinski_harabasz" ->
      s"""WITH ${TrainingData4.kmeansCte},
         |cn AS (
         |  SELECT cid, ce, ${dotSql("ce", "ce")} AS cn2 FROM c1),
         |sw AS (
         |  SELECT a2.cid, CAST(count(*) AS BIGINT) AS n_members,
         |         list_sum(list(greatest(0.0, 1.0 - 2.0 * a2.cos + cn.cn2)
         |           ORDER BY a2.vec_id)) AS sw
         |  FROM a2 JOIN cn ON a2.cid = cn.cid
         |  GROUP BY a2.cid, cn.cn2),
         |qs AS (
         |  SELECT pos, CAST(sum(qx) AS BIGINT) AS sq,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(list_transform(en.e,
         |            x -> CAST(floor(x * 1048576.0) AS BIGINT))) AS qx,
         |          unnest(range(1, len(en.e) + 1)) AS pos
         |        FROM a2 JOIN e en ON a2.vec_id = en.vec_id)
         |  GROUP BY pos),
         |mean_ AS (
         |  SELECT list(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0
         |    ORDER BY pos) AS xb
         |  FROM qs),
         |ssb AS (
         |  SELECT list_sum(list(
         |    CAST(sw.n_members AS DOUBLE) * list_sum(
         |      list_transform(range(1, len(cn.ce) + 1),
         |        i -> (cn.ce[i] - m.xb[i]) * (cn.ce[i] - m.xb[i])))
         |    ORDER BY sw.cid)) AS ssb
         |  FROM sw JOIN cn ON sw.cid = cn.cid CROSS JOIN mean_ m),
         |tot AS (
         |  SELECT CAST(sum(n_members) AS BIGINT) AS n,
         |         CAST(count(*) AS BIGINT) AS k,
         |         list_sum(list(sw ORDER BY cid)) AS ssw
         |  FROM sw)
         |SELECT t.n AS n_vectors, t.k AS n_clusters,
         |       round(b.ssb, 6) AS ssb, round(t.ssw, 6) AS ssw,
         |       round((b.ssb / CAST(t.k - 1 AS DOUBLE))
         |         / (t.ssw / CAST(t.n - t.k AS DOUBLE)), 6) AS ch_index
         |FROM tot t CROSS JOIN ssb b""".stripMargin,
    "e_matryoshka_cka" -> {
      val prefixSql = CkaPrefixes.mkString(", ")
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |ex AS (
         |  SELECT vec_id, qv, unnest(range(0, 64)) AS i FROM q),
         |gram AS (
         |  SELECT a.i, b.j, CAST(sum(a.qi * b.qj) AS BIGINT) AS g
         |  FROM (SELECT vec_id, i, qv[i + 1] AS qi FROM ex) a
         |  JOIN (SELECT vec_id, i AS j, qv[i + 1] AS qj FROM ex) b
         |    USING (vec_id)
         |  GROUP BY a.i, b.j),
         |sums AS (
         |  SELECT i, CAST(sum(qv[i + 1]) AS BIGINT) AS s,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM ex GROUP BY i),
         |cent AS (
         |  SELECT g.i, g.j, si.n,
         |         CAST(g.g AS DOUBLE)
         |           - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE)
         |             / CAST(si.n AS DOUBLE) AS c
         |  FROM gram g JOIN sums si ON g.i = si.i
         |              JOIN sums sj ON g.j = sj.i),
         |hx AS (
         |  SELECT any_value(n) AS n,
         |         list_sum(list(c * c ORDER BY i, j)) AS hxx
         |  FROM cent),
         |pr AS (SELECT unnest([$prefixSql]) AS p),
         |hp AS (
         |  SELECT pr.p,
         |         list_sum(list(cent.c * cent.c ORDER BY cent.i, cent.j)
         |           FILTER (WHERE cent.j < pr.p)) AS hxy,
         |         list_sum(list(cent.c * cent.c ORDER BY cent.i, cent.j)
         |           FILTER (WHERE cent.i < pr.p AND cent.j < pr.p)) AS hyy
         |  FROM cent CROSS JOIN pr GROUP BY pr.p)
         |SELECT hx.n AS n_vectors, CAST(hp.p AS BIGINT) AS prefix_dim,
         |       round(hp.hxy / sqrt(hx.hxx * hp.hyy), 6) AS cka
         |FROM hp CROSS JOIN hx
         |ORDER BY prefix_dim""".stripMargin
    },
    "e_jl_distortion" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |rmat AS (
         |  SELECT i, k,
         |         CASE WHEN substr(md5('jl' || i || ':' || k), 1, 1)
         |           IN ('0','1','2','3','4','5','6','7')
         |           THEN 0.25 ELSE -0.25 END AS r
         |  FROM (SELECT unnest(range(0, 64)) AS i)
         |  CROSS JOIN (SELECT unnest(range(0, 16)) AS k)),
         |vx AS (
         |  SELECT vec_id, emb, unnest(range(0, 64)) AS i FROM e),
         |proj AS (
         |  SELECT vec_id, list(p ORDER BY k) AS pv
         |  FROM (
         |    SELECT vx.vec_id, r.k,
         |           list_sum(list(vx.emb[vx.i + 1] * r.r ORDER BY vx.i)) AS p
         |    FROM vx JOIN rmat r ON vx.i = r.i
         |    GROUP BY vx.vec_id, r.k)
         |  GROUP BY vec_id),
         |ed AS (
         |  SELECT eg.src, eg.dst,
         |         list_sum(list_transform(range(1, len(ea.emb) + 1),
         |           i -> (ea.emb[i] - eb.emb[i]) * (ea.emb[i] - eb.emb[i])))
         |           AS od2,
         |         list_sum(list_transform(range(1, len(pa.pv) + 1),
         |           i -> (pa.pv[i] - pb.pv[i]) * (pa.pv[i] - pb.pv[i])))
         |           AS pd2
         |  FROM edges eg JOIN e ea ON eg.src = ea.vec_id
         |                JOIN e eb ON eg.dst = eb.vec_id
         |                JOIN proj pa ON eg.src = pa.vec_id
         |                JOIN proj pb ON eg.dst = pb.vec_id),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM e),
         |used AS (
         |  SELECT src, dst, pd2 / od2 AS ratio FROM ed
         |  WHERE od2 > 0.000000000001),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ed),
         |wi AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_within
         |  FROM used CROSS JOIN nv
         |  WHERE abs(ratio - 1.0) <= sqrt(8.0 * ln(CAST(nv AS DOUBLE))
         |    / 16.0))
         |SELECT t.n_edges, CAST(count(*) AS BIGINT) AS n_used,
         |       CAST(t.n_edges - count(*) AS BIGINT) AS n_zero_excluded,
         |       round(min(u.ratio), 6) AS min_ratio,
         |       round(max(u.ratio), 6) AS max_ratio,
         |       round(list_sum(list(u.ratio ORDER BY u.src, u.dst))
         |         / CAST(count(*) AS DOUBLE), 6) AS mean_ratio,
         |       round(sqrt(8.0 * ln(CAST(n.nv AS DOUBLE)) / 16.0), 6)
         |         AS eps_jl,
         |       round(CAST(w.n_within AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE), 6) AS share_within_eps
         |FROM used u CROSS JOIN tot t CROSS JOIN nv n CROSS JOIN wi w
         |GROUP BY t.n_edges, n.nv, w.n_within""".stripMargin)
}
