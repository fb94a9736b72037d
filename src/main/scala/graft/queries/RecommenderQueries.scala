package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det

/** Collaborative-filtering surface of the reference (`Part_A_Q2.py`):
  * activity semi-joins, the user×item ratings matrix, all-pairs user
  * similarity, kNN neighborhoods, weighted rating prediction with
  * MAE/RMSE — on the driver corpus `events` table (user_id × event_type,
  * value as the rating; see FIXTURES.md role mapping).
  *
  * Scale design: the reference pivots to a dense numpy matrix and runs
  * `np.corrcoef` over ALL user pairs (`Part_A_Q2.py:94-116`) — O(u²)
  * memory on one node. Here everything stays in long/COO form; the
  * all-pairs step is an item-grouped self-join restricted (like the
  * reference's own top-users prefilter, `Part_A_Q2.py:80-89`) to the
  * top-k most active users, so the pair count is a constant independent
  * of corpus size. Nothing is ever collected to the driver.
  */
object RecommenderQueries {

  private val TopUsers   = 20
  private val K          = 3
  /** The corpus's static event-type domain (stable across SFs) —
    * shared so the pivot/unpivot surfaces can't drift apart. */
  private[graft] val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Long-form ratings matrix: avg value per (user, event_type),
    * computed in exact integer cents (see [[Det]]) so the value is
    * bit-identical to the oracle's regardless of summation order. */
  private def ratings(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(Det.moneyAvg(col("value"), 6).as("r"))

  /** Reference prefilter (`Part_A_Q2.py:80-89`): most-active users. */
  private def topActiveUsers(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("user_id"))
      .limit(TopUsers)
      .select("user_id")

  /** Top-user ratings, MATERIALIZED via `localCheckpoint`: the frame is
    * tiny (≤ TopUsers × |event types| rows) but sits under a self-join
    * plus two means — without a cut, every reuse re-scans `events`.
    * `localCheckpoint` (vs `cache`) also frees its blocks on GC, so a
    * long-lived shared session doesn't accumulate leaked cache entries
    * across queries (ADVICE r1). */
  private def topRatings(spark: SparkSession, dir: String): DataFrame =
    ratings(spark, dir).join(broadcast(topActiveUsers(spark, dir)), "user_id")
      .localCheckpoint()

  /** Pairwise Pearson similarity over the top users (reference
    * `np.corrcoef`, `Part_A_Q2.py:114-116`): self-join on the item key,
    * `corr` per (u1,u2) group — the relational form of the correlation
    * matrix, upper triangle only. Takes the (checkpointed) ratings so
    * kNN and prediction share ONE similarity subtree instead of
    * re-deriving it per consumer (VERDICT r1 §perf). */
  private def similarities(rt: DataFrame): DataFrame = {
    val a = rt.select(col("user_id").as("u1"), col("event_type").as("i"), col("r").as("r1"))
    val b = rt.select(col("user_id").as("u2"), col("event_type").as("i"), col("r").as("r2"))
    a.join(b, Seq("i"))
      .filter(col("u1") < col("u2"))
      .groupBy("u1", "u2")
      .agg(corr("r1", "r2").as("sim_raw"))
      .filter(col("sim_raw").isNotNull && !isnan(col("sim_raw")))
      .select(col("u1"), col("u2"), round(col("sim_raw"), 4).as("sim"))
  }

  /** Symmetrized similarity pairs: one row per directed (u, nbr). */
  private def symSims(sims: DataFrame): DataFrame =
    sims.select(col("u1").as("u"), col("u2").as("nbr"), col("sim"))
      .unionAll(sims.select(col("u2").as("u"), col("u1").as("nbr"), col("sim")))

  /** Top-k neighbors per user (reference argsort slice,
    * `Part_A_Q2.py:121-123`, self excluded): window row_number — the
    * distributed top-k-per-group idiom, one shuffle on `u`. */
  private def knn(sims: DataFrame): DataFrame = {
    val w = Window.partitionBy("u").orderBy(desc("sim"), asc("nbr"))
    symSims(sims)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
  }

  /** Scale twin of [[userSimilarity]] (VERDICT r8 stretch #7): all-pairs
    * column cosine via mllib `RowMatrix.columnSimilarities(threshold)` —
    * DIMSUM (Zadeh & Goel, "Dimension Independent Similarity
    * Computation", 2013). The exact self-join + `corr` plan above is the
    * oracle-matched surface, faithful to `Part_A_Q2.py:114-116`; at
    * 100 TB the self-join's candidate pairs grow with the square of the
    * hottest item's user count, while DIMSUM samples each row with
    * probability ∝ γ/(‖cᵢ‖·‖cⱼ‖), so every pair with cosine ≥ threshold
    * survives (w.h.p., exactly when the probabilities clamp to 1) at
    * O(n·γ²) shuffle cost independent of row count.
    *
    * Layout: rows = items (the 5-value event-type vocabulary), columns =
    * users, entries = per-user mean-centered ratings, so column cosine
    * equals dense-vector Pearson — the same statistic the reference's
    * `np.corrcoef` computes on the zero-filled pivot. The user slice is
    * the bounded TopUsers prefilter, so the two driver-side collects
    * below are ≤ TopUsers rows (a fixed vocabulary, not corpus-sized);
    * at full scale one would run DIMSUM on the UNcentered sparse matrix
    * (plain cosine) since mean-centering densifies.
    *
    * `threshold = 0` disables sampling → brute-force-exact cosine; the
    * spec uses that as the in-family ground truth for the superset
    * assertion.
    */
  def userSimilarityDimsum(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rt = topRatings(spark, dir)
    val users: Array[Long] = rt.select("user_id").distinct().orderBy("user_id")
      .collect().map(_.getLong(0)) // ≤ TopUsers rows by construction
    val nItems = EventTypes.size
    // per-user dense mean and centered-column norm in one bounded pass:
    // μ = Σr/n, ‖c‖² = Σr² − n·μ² (absent cells are 0). Columns are
    // pre-normalized to UNIT norm before DIMSUM — cosine is invariant
    // per-column scaling, and unit norms clamp the sampling probability
    // min(1, √γ/‖c‖) to 1, so on any matrix whose γ = 10·ln(n)/s ≥ 1
    // the "sampled" run is deterministic and exact. (Raw money-valued
    // norms ~10² would push the keep-probability to ~0.1 on a 5-row
    // matrix — the few-rows regime DIMSUM's w.h.p. bound doesn't cover.)
    val stats: Map[Long, (Double, Double)] = rt.groupBy("user_id")
      .agg(sum(col("r").cast("double")).as("s"),
           sum(col("r").cast("double") * col("r").cast("double")).as("s2"))
      .collect().map { r =>
        val s = r.getDouble(1); val s2 = r.getDouble(2)
        val mu = s / nItems
        val norm = math.sqrt(math.max(0.0, s2 - nItems * mu * mu))
        r.getLong(0) -> (mu, if (norm == 0.0) 1.0 else norm)
      }.toMap
    val userIdx = users.zipWithIndex.toMap
    val muArr = users.map(u => stats(u)._1)
    val nrmArr = users.map(u => stats(u)._2)
    val bIdx = spark.sparkContext.broadcast(userIdx)
    val bMu = spark.sparkContext.broadcast(muArr)
    val bNrm = spark.sparkContext.broadcast(nrmArr)
    val nUsers = users.length
    val rows = rt.select(col("event_type"), col("user_id"), col("r").cast("double"))
      .rdd.map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .groupByKey()
      .map { case (_, cells) =>
        // dense zero-filled column centered by its dense mean: absent
        // cells contribute 0 − μᵤ, present ones r − μᵤ; then unit-scale
        val arr = Array.tabulate(nUsers)(j => -bMu.value(j) / bNrm.value(j))
        cells.foreach { case (u, v) =>
          val j = bIdx.value(u); arr(j) = (v - bMu.value(j)) / bNrm.value(j)
        }
        OldVectors.dense(arr)
      }
    val sims =
      if (threshold > 0) new RowMatrix(rows).columnSimilarities(threshold)
      else new RowMatrix(rows).columnSimilarities()
    val sc = spark
    import sc.implicits._
    sims.entries
      .map(e => (users(e.i.toInt), users(e.j.toInt), e.value))
      .toDF("u1", "u2", "sim")
      .orderBy("u1", "u2")
  }

  // ---------------------------------------------------------------- queries

  /** J3 — semi-join on active users (reference `isin` against
    * value_counts, `Part_A_Q2.py:83-89`): left_semi join against the
    * aggregate, never a collected driver-side list. */
  def semijoinActive(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val active = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 50)
      .select("user_id")
    events.join(active, Seq("user_id"), "left_semi")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), Det.moneySum(col("value")).as("total_value"))
      .orderBy("user_id")
  }

  val semijoinActiveSql: String =
    s"""SELECT user_id, count(*) AS n_events, ${Det.moneySumSql("value")} AS total_value
       |FROM events
       |WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 50)
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** A5+A6 — groupBy-mean + pivot/unstack to the wide user×item matrix
    * (reference `Part_A_Q2.py:93-94`, `fill_value=0`). Explicit pivot
    * values keep the schema static (no extra distinct-values job) and
    * the oracle reproducible; at 100 TB the long/COO form used by the
    * other queries is the scale path (SURVEY §4). */
  def pivotMatrix(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(Det.moneyAvg(col("value"), 4).as("r"))
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(first("r"))
      .na.fill(0.0, EventTypes)
      .orderBy("user_id")

  val pivotMatrixSql: String = {
    val cell = (t: String) =>
      Det.rndSql(
        s"CAST(sum(CASE WHEN event_type = '$t' THEN ${Det.centsSql("value")} END) AS DOUBLE) / " +
          s"(count(CASE WHEN event_type = '$t' THEN value END) * 100.0)", 4)
    s"""SELECT user_id,
       |  ${EventTypes.map(t => s"coalesce(${cell(t)}, 0) AS $t").mkString(",\n  ")}
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** A7/A9/J4 — the user-user correlation matrix in relational form. */
  def userSimilarity(spark: SparkSession, dir: String): DataFrame =
    similarities(topRatings(spark, dir)).orderBy("u1", "u2")

  private val simCte: String =
    s"""WITH ratings AS (
      |  SELECT user_id, event_type, ${Det.moneyAvgSql("value", 6)} AS r FROM events GROUP BY 1, 2),
      |top_u AS (
      |  SELECT user_id FROM events GROUP BY user_id ORDER BY count(*) DESC, user_id LIMIT 20),
      |rt AS (SELECT * FROM ratings WHERE user_id IN (SELECT user_id FROM top_u)),
      |sims AS (
      |  SELECT a.user_id AS u1, b.user_id AS u2, round(corr(a.r, b.r), 4) AS sim
      |  FROM rt a JOIN rt b ON a.event_type = b.event_type AND a.user_id < b.user_id
      |  GROUP BY a.user_id, b.user_id
      |  HAVING corr(a.r, b.r) IS NOT NULL),
      |sym AS (SELECT u1 AS u, u2 AS nbr, sim FROM sims
      |        UNION ALL SELECT u2, u1, sim FROM sims)""".stripMargin

  val userSimilaritySql: String =
    simCte + "\nSELECT u1, u2, sim FROM sims ORDER BY u1, u2"

  /** T3 — kNN neighborhoods (k+1-free, unlike the reference's
    * off-by-one slice at `Part_A_Q2.py:121-123`). */
  def knnNeighbors(spark: SparkSession, dir: String): DataFrame =
    knn(similarities(topRatings(spark, dir)))
      .select("u", "nbr", "sim", "rn").orderBy("u", "rn")

  val knnNeighborsSql: String =
    simCte +
      """
        |SELECT u, nbr, sim, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT u, nbr, sim, row_number() OVER (PARTITION BY u ORDER BY sim DESC, nbr) AS rn
        |  FROM sym)
        |WHERE rn <= 3
        |ORDER BY u, rn""".stripMargin

  /** R4+A14+A15 — weighted neighborhood prediction and its MAE/RMSE
    * (reference `Part_A_Q2.py:130-147,194-198`):
    * p(u,i) = μ_u + Σₙ s(u,n)·(r(n,i) − μₙ) / Σₙ s(u,n), evaluated
    * against the observed ratings. All joins + one aggregation — the
    * reference's nested Python double-loop over the full matrix
    * (`Part_A_Q2.py:194`) becomes a fully distributed plan. Neighbor
    * sets with near-zero similarity mass are dropped (|Σs| > 0.05) to
    * keep the division numerically stable across engines. */
  def predictEval(spark: SparkSession, dir: String): DataFrame = {
    val rt = topRatings(spark, dir)
    // exact fixed-point mean (r is a 6-dp decimal): plain round(avg(r))
    // can flip the 6th digit between engines at round-half points
    val means = rt.groupBy("user_id").agg(Det.fixedAvg(col("r"), 6, 6).as("mu"))
    val nbrs = knn(similarities(rt))
    val pred = nbrs
      .join(rt.select(col("user_id").as("nbr"), col("event_type").as("i"), col("r")), "nbr")
      .join(means.select(col("user_id").as("nbr"), col("mu").as("mu_n")), "nbr")
      .join(means.select(col("user_id").as("u"), col("mu").as("mu_u")), "u")
      .groupBy("u", "i", "mu_u")
      .agg(sum(col("sim") * (col("r") - col("mu_n"))).as("num"), sum("sim").as("den"))
      .filter(abs(col("den")) > 0.05)
      .select(col("u"), col("i"), round(col("mu_u") + col("num") / col("den"), 6).as("p"))
    val err = pred.join(
      rt.select(col("user_id").as("u"), col("event_type").as("i"), col("r")),
      Seq("u", "i"))
    // one aggregation pass for all three metrics, unpivoted to rows —
    // a per-metric union would recompute the whole upstream per branch
    err
      .agg(
        round(avg(abs(col("p") - col("r"))), 6).as("mae"),
        count(lit(1)).cast("double").as("n_pairs"),
        round(sqrt(avg((col("p") - col("r")) * (col("p") - col("r")))), 6).as("rmse"))
      .select(explode(map(
        lit("mae"), col("mae"),
        lit("n_pairs"), col("n_pairs"),
        lit("rmse"), col("rmse"))).as(Seq("metric", "value")))
      .orderBy("metric")
  }

  /** R3 — bounded FULL prediction-matrix reconstruction (reference
    * `Part_A_Q2.py:194`: predict every (user, item) cell of the
    * matrix). The cell universe is the crossJoin of the top users
    * with the (tiny, fixed) item vocabulary — at 100 TB "every cell"
    * is only meaningful against such a bounded user slice, which is
    * also exactly the reference's own top-users prefilter. Cells with
    * no usable neighborhood fall back to the user mean (the
    * reference's fallback when the weighted sum has no mass);
    * observed ratings ride along for evaluation (`r_obs` is NULL on
    * never-rated cells — the cells only full reconstruction reaches). */
  def predictMatrix(spark: SparkSession, dir: String): DataFrame = {
    val rt = topRatings(spark, dir)
    val means = rt.groupBy("user_id").agg(Det.fixedAvg(col("r"), 6, 6).as("mu"))
    val nbrs = knn(similarities(rt))
    val cells = topActiveUsers(spark, dir).select(col("user_id").as("u"))
      .crossJoin(spark.range(1).select(
        explode(array(EventTypes.map(lit): _*)).as("i")))
    val contrib = nbrs
      .join(rt.select(col("user_id").as("nbr"), col("event_type").as("i"), col("r")), "nbr")
      .join(means.select(col("user_id").as("nbr"), col("mu").as("mu_n")), "nbr")
      .groupBy("u", "i")
      .agg(sum(col("sim") * (col("r") - col("mu_n"))).as("num"), sum("sim").as("den"))
    cells
      .join(means.select(col("user_id").as("u"), col("mu").as("mu_u")), "u")
      .join(contrib, Seq("u", "i"), "left")
      .withColumn("p", round(
        col("mu_u") + when(abs(col("den")) > 0.05, col("num") / col("den")).otherwise(0.0), 6))
      .join(rt.select(col("user_id").as("u"), col("event_type").as("i"), col("r").as("r_obs")),
        Seq("u", "i"), "left")
      .select(col("u"), col("i"), col("p"), col("r_obs"))
      .orderBy("u", "i")
  }

  val predictMatrixSql: String =
    simCte +
      """,
        |nbrs AS (SELECT u, nbr, sim FROM (
        |  SELECT u, nbr, sim, row_number() OVER (PARTITION BY u ORDER BY sim DESC, nbr) AS rn
        |  FROM sym) WHERE rn <= 3),
        |means AS (SELECT user_id, """.stripMargin + Det.fixedAvgSql("r", 6, 6) +
      """ AS mu FROM rt GROUP BY 1),
        |cells AS (SELECT t.user_id AS u, i.i
        |          FROM top_u t CROSS JOIN (VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')) AS i(i)),
        |contrib AS (
        |  SELECT n.u, r2.event_type AS i,
        |         sum(n.sim * (r2.r - mun.mu)) AS num, sum(n.sim) AS den
        |  FROM nbrs n
        |  JOIN rt r2 ON r2.user_id = n.nbr
        |  JOIN means mun ON mun.user_id = n.nbr
        |  GROUP BY 1, 2)
        |SELECT c.u, c.i,
        |       round(m.mu + CASE WHEN abs(ct.den) > 0.05 THEN ct.num / ct.den ELSE 0 END, 6) AS p,
        |       r.r AS r_obs
        |FROM cells c
        |JOIN means m ON m.user_id = c.u
        |LEFT JOIN contrib ct ON ct.u = c.u AND ct.i = c.i
        |LEFT JOIN rt r ON r.user_id = c.u AND r.event_type = c.i
        |ORDER BY c.u, c.i""".stripMargin

  val predictEvalSql: String =
    simCte +
      """,
        |nbrs AS (SELECT u, nbr, sim FROM (
        |  SELECT u, nbr, sim, row_number() OVER (PARTITION BY u ORDER BY sim DESC, nbr) AS rn
        |  FROM sym) WHERE rn <= 3),
        |means AS (SELECT user_id, """.stripMargin + Det.fixedAvgSql("r", 6, 6) +
      """ AS mu FROM rt GROUP BY 1),
        |pred AS (
        |  SELECT n.u, r2.event_type AS i,
        |         round(mu.mu + sum(n.sim * (r2.r - mun.mu)) / sum(n.sim), 6) AS p
        |  FROM nbrs n
        |  JOIN rt r2 ON r2.user_id = n.nbr
        |  JOIN means mun ON mun.user_id = n.nbr
        |  JOIN means mu ON mu.user_id = n.u
        |  GROUP BY n.u, r2.event_type, mu.mu
        |  HAVING abs(sum(n.sim)) > 0.05),
        |err AS (SELECT p.p, r.r FROM pred p JOIN rt r ON r.user_id = p.u AND r.event_type = p.i)
        |SELECT * FROM (
        |  SELECT 'mae' AS metric, round(avg(abs(p - r)), 6) AS value FROM err
        |  UNION ALL SELECT 'n_pairs', CAST(count(*) AS DOUBLE) FROM err
        |  UNION ALL SELECT 'rmse', round(sqrt(avg((p - r) * (p - r))), 6) FROM err)
        |ORDER BY metric""".stripMargin

  /** ONE ALTERNATING-LEAST-SQUARES HALF-STEP (Koren/Bell/Volinsky's
    * MF family) with rank-2 latent factors on the customer×part
    * quantity matrix: item factors are FIXED (a deterministic integer
    * hash init), and each user's factor vector solves its 2×2
    * ridge-regularized normal equations in CLOSED FORM — the
    * matrix-factorization complement of the neighborhood predictor
    * ([[predictEval]] interpolates over users; ALS embeds them).
    *
    * Scale shape: this is the exact computation a distributed ALS
    * iteration does — per-user independent solves after ONE shuffle
    * of the rating relation on custkey (map-side partial sums build
    * the per-user Gram entries); no iteration-global state beyond the
    * broadcast-sized item-factor derivation, which here is a hash
    * FORMULA (zero bytes shipped). Determinism: item factors and
    * ratings are integers, so all five Gram/moment sums are EXACT
    * (Σqₐ², Σqₐq_b, Σrqₐ … in longs), the ridge (λ=1) determinant is
    * an exact positive integer, and Cramer's rule divides exact
    * integers once — both engines produce bit-identical factors. The
    * per-user SSE sums ≤|items| identical doubles, fenced at 4 dp. */
  def alsStep(spark: SparkSession, dir: String): DataFrame =
    alsStepOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"))

  private[graft] def alsStepOf(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    // 32-bit multiplicative mix of the part key → two factors in [−9, 9]
    val mix = "(((l_partkey % 4294967296) * 34283 % 65536) * 65536" +
      " + (l_partkey % 4294967296) * 51831) % 4294967296"
    val ratings = lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("r"))
      .withColumn("qa", expr(s"($mix) % 19 - 9"))
      .withColumn("qb", expr(s"($mix) div 19 % 19 - 9"))
    val solved = ratings.groupBy("u")
      .agg(count(lit(1)).as("n_items"),
        sum(col("qa") * col("qa")).as("saa"),
        sum(col("qa") * col("qb")).as("sab"),
        sum(col("qb") * col("qb")).as("sbb"),
        sum(col("r") * col("qa")).as("ba"),
        sum(col("r") * col("qb")).as("bb"))
      .withColumn("det", expr(
        "(saa + 1) * (sbb + 1) - sab * sab").cast("double"))
      .withColumn("u1", expr(
        "(ba * (sbb + 1) - bb * sab)").cast("double") / col("det"))
      .withColumn("u2", expr(
        "(bb * (saa + 1) - ba * sab)").cast("double") / col("det"))
    val e = col("r") - col("u1") * col("qa") - col("u2") * col("qb")
    ratings.join(solved, "u")
      .groupBy(col("u"), col("n_items"), col("u1"), col("u2"))
      .agg(sum(e * e).as("sse"))
      .select(col("u").as("custkey"), col("n_items"),
        Det.rnd(col("u1"), 6).as("u1"), Det.rnd(col("u2"), 6).as("u2"),
        Det.rnd(col("sse"), 4).as("sse"))
      .orderBy("custkey")
      .limit(20)
  }

  val alsStepSql: String = {
    val mix = "(((l_partkey % 4294967296) * 34283 % 65536) * 65536" +
      " + (l_partkey % 4294967296) * 51831) % 4294967296"
    s"""WITH ratings AS (
       |  SELECT u, l_partkey, r,
       |         ($mix) % 19 - 9 AS qa,
       |         ($mix) // 19 % 19 - 9 AS qb
       |  FROM (SELECT o_custkey AS u, l_partkey,
       |               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
       |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |        GROUP BY 1, 2)),
       |solved AS (
       |  SELECT u, count(*) AS n_items,
       |         CAST(sum(qa * qa) AS BIGINT) AS saa,
       |         CAST(sum(qa * qb) AS BIGINT) AS sab,
       |         CAST(sum(qb * qb) AS BIGINT) AS sbb,
       |         CAST(sum(r * qa) AS BIGINT) AS ba,
       |         CAST(sum(r * qb) AS BIGINT) AS bb
       |  FROM ratings GROUP BY 1),
       |uf AS (
       |  SELECT u, n_items,
       |         CAST(ba * (sbb + 1) - bb * sab AS DOUBLE)
       |           / CAST((saa + 1) * (sbb + 1) - sab * sab AS DOUBLE) AS u1,
       |         CAST(bb * (saa + 1) - ba * sab AS DOUBLE)
       |           / CAST((saa + 1) * (sbb + 1) - sab * sab AS DOUBLE) AS u2
       |  FROM solved)
       |SELECT r.u AS custkey, any_value(n_items) AS n_items,
       |       ${Det.rndSql("any_value(u1)", 6)} AS u1,
       |       ${Det.rndSql("any_value(u2)", 6)} AS u2,
       |       ${Det.rndSql(
            "sum((r.r - u1 * qa - u2 * qb) * (r.r - u1 * qa - u2 * qb))", 4)} AS sse
       |FROM ratings r JOIN uf ON uf.u = r.u
       |GROUP BY r.u
       |ORDER BY custkey
       |LIMIT 20""".stripMargin
  }
}
