package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding similarity search over the `embeddings` table
  * (`vec_id, embedding: array<float>, label`) — the ANN surface of a
  * training-data pipeline (A8 analog on real vectors).
  *
  * Scale design: query vectors are BROADCAST against a single scan of
  * the corpus (no shuffle until the per-query top-k), and the dot
  * product is a higher-order-function fold (`zip_with` + `aggregate`)
  * — pure Catalyst expressions, no UDF, no Python. The LSH variant
  * buckets the corpus by random-hyperplane signs so each query probes
  * ~1/2^bits of the data — the 100 TB path where brute force dies.
  */
object SimilarityQueries {

  private val K        = 5
  private val NQueries = 10

  /** Cosine via the codegen'd [[graft.functions.CosineSimilarity]]
    * expression — one tight loop per pair instead of three interpreted
    * HOF folds (see its scaladoc for the measurement rationale). */
  private def withCos(df: DataFrame): DataFrame = {
    graft.functions.CosineSimilarity.register(df.sparkSession)
    df.withColumn("cos", expr("cosine_sim(qe, ce)"))
  }

  /** Brute-force cosine top-k: the correctness baseline every ANN
    * variant is measured against. */
  def cosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    withCos(broadcast(q).crossJoin(c))
      .filter(col("qid") =!= col("cid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy("qid", "rank")
  }

  val cosineTopkSql: String =
    s"""WITH e AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, unnest(range(len(embedding))) AS i
       |           FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id < $NQueries),
       |dot AS (SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot,
       |               sqrt(sum(q.v * q.v)) AS nq, sqrt(sum(c.v * c.v)) AS nc
       |        FROM q JOIN e c ON q.i = c.i AND q.vec_id <> c.vec_id
       |        GROUP BY 1, 2)
       |SELECT qid, cid, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT qid, cid, CASE WHEN nq * nc = 0 THEN 0.0 ELSE dot / (nq * nc) END AS cos,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY CASE WHEN nq * nc = 0 THEN 0.0 ELSE dot / (nq * nc) END DESC, cid) AS rank
       |  FROM dot)
       |WHERE rank <= $K
       |ORDER BY qid, rank""".stripMargin

  /** Corpus statistics per label: count + mean L2 norm — the sanity
    * profile run before any similarity work. */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .withColumn("norm",
        expr("sqrt(aggregate(embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), round(avg("norm"), 6).as("avg_norm"))
      .orderBy("label")

  val embeddingStatsSql: String =
    """SELECT label, count(*) AS n_vecs, round(avg(norm), 6) AS avg_norm
      |FROM (SELECT label, sqrt(sum(v * v)) AS norm
      |      FROM (SELECT vec_id, label, unnest(embedding)::DOUBLE AS v FROM embeddings)
      |      GROUP BY vec_id, label)
      |GROUP BY label
      |ORDER BY label""".stripMargin

  /** LSH-bucketed approximate nearest neighbors (the scale path):
    * random-hyperplane sign buckets with hamming-1 MULTI-PROBE — the
    * query side explodes into its own bucket plus every 1-bit-flip
    * neighbor and equi-joins, so each query touches ~(1+p)/2^p of the
    * corpus instead of all of it, and the probe fan-out stays an
    * equi-join (no theta join) at any scale. Planes are deterministic
    * pseudo-random vectors derived from `xxhash64(plane, dim)` — no
    * RNG state, reproducible across runs. Engine-specific hashing →
    * no SQL oracle (rows-only); recall vs the brute-force baseline is
    * asserted in ScalaTest. Plane count trades recall vs cost: more
    * planes → smaller buckets → cheaper and lower recall. */
  def annLsh(spark: SparkSession, dir: String, nPlanes: Int = 4): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    // bucket = Σ_p [dot(e, plane_p) > 0] << p, planes pseudo-random via
    // xxhash64 → uniform in [-0.5, 0.5)
    val planeW = (p: Int) =>
      s"transform(sequence(0, size(embedding) - 1), i -> (CAST(pmod(xxhash64($p * 1024 + i), 1000000) AS DOUBLE) / 1000000.0) - 0.5)"
    val bucketExpr = (0 until nPlanes).map { p =>
      s"(CASE WHEN aggregate(zip_with(embedding, ${planeW(p)}, (x, w) -> CAST(x AS DOUBLE) * w), CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    val bucketed = emb.withColumn("bucket", expr(bucketExpr))
    val probes = (0 until nPlanes).map(p => col("bucket").bitwiseXOR(1 << p))
    val q = bucketed.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(array(col("bucket") +: probes: _*)).as("bucket"))
    val c = bucketed
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    withCos(broadcast(q).join(c, "bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy("qid", "rank")
  }

  /** IVF approximate nearest neighbors: k-means coarse quantizer
    * (seeded → deterministic), corpus partitioned by nearest centroid,
    * queries probe the `nprobe` nearest cells then run exact cosine
    * inside them — the standard billion-scale ANN layout (IVF-flat).
    * The centroid table is tiny and broadcast; the corpus is scanned
    * once to assign cells (a narrow map), and each query reads
    * nprobe/k of the data. */
  def annIvf(spark: SparkSession, dir: String,
             nCells: Int = 8, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("fv", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(42).setFeaturesCol("fv")
      .setPredictionCol("cell").setMaxIter(5).fit(emb)
    val assigned = model.transform(emb)
    val c = assigned.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("cell"))
    // query probes: rank centroids by distance per query, keep nProbe
    val cents = model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
    val centDf = spark.createDataFrame(cents).toDF("cell", "centroid")
    val q0 = assigned.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val dist = expr(
      "aggregate(zip_with(qe, centroid, (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val wProbe = Window.partitionBy("qid").orderBy(asc("d2"), asc("cell"))
    val probes = broadcast(q0).crossJoin(broadcast(centDf))
      .withColumn("d2", dist)
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select("qid", "qe", "cell")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    withCos(broadcast(probes).join(c, "cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy("qid", "rank")
  }
}
