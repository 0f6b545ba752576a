package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (Array[Float]) — SURVEY §2.11. The dot products are built from
  * `zip_with` + `aggregate`, which Catalyst codegens; no UDF.
  *
  * Scale shape: brute force is queries × corpus — fine when the query set
  * is small enough to broadcast (the common "find neighbors for this
  * batch" case). The IVF/LSH variant buckets the corpus once (one narrow
  * shuffle) and joins only same-bucket candidates. */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * (it is broadcast to every executor); the corpus streams through one
    * narrow pass, then a per-query top-k window. */
  def bruteForceTopK(corpus0: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val corpus = Par.ensure(corpus0)
    var joined = corpus.crossJoin(broadcast(queries))
    if (excludeSelf) joined = joined.filter(col(idCol) =!= col(qIdCol))
    val scored = joined.withColumn("cosine", cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 -> ±1. Gives a reproducible signature without materializing
    * plane matrices. */
  private def planeComponent(plane: Int, dim: Column): Column =
    when(pmod(xxhash64(lit(plane), dim), lit(2)) === 0, lit(1.0d)).otherwise(lit(-1.0d))

  /** Random-hyperplane LSH signature (nPlanes bits) of a vector column. */
  def signature(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * each vector assigned to its nearest centroid ONCE; queries probe the
    * `nProbe` nearest centroids and run exact cosine only within those
    * cells. The classic big-corpus scale path: corpus work is one
    * clustering pass + one assignment column, per-query work is
    * nProbe/nClusters of the data. Centroids are tiny and broadcast. */
  def ivfTopK(corpus0: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nClusters: Int = 64, nProbe: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus0.sparkSession
    val corpus = Par.ensure(corpus0)
      .withColumn("__fv", array_to_vector(col(vecCol)))
    // fit on a bounded sample: the quantizer needs cluster SHAPE, not
    // every row — at corpus scale a full fit would dominate the query
    val model = new KMeans().setK(nClusters).setSeed(7L).setMaxIter(10)
      .setFeaturesCol("__fv").setPredictionCol("__cell")
      .fit(corpus.select("__fv").limit(65536))
    val assigned = model.transform(corpus).drop("__fv")
    // centroid table: tiny (nClusters rows), broadcast to rank cells/query
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("__cell", "__centroid")
    val probeW = Window.partitionBy(col(qIdCol)).orderBy(col("__cdist"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("__cdist", -cosine(col(qVecCol), col("__centroid")))
      .withColumn("__crank", row_number().over(probeW))
      .filter(col("__crank") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("__cell"))
    var cands = assigned.join(broadcast(probes), "__cell")
    if (excludeSelf) cands = cands.filter(col(idCol) =!= col(qIdCol))
    val scored = cands.withColumn("cosine", cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** ANN top-k: LSH-bucket the corpus, probe each query's bucket plus all
    * 1-bit-flip neighbor buckets (multi-probe), exact cosine within the
    * candidate set. Trades recall for touching ~(nPlanes+1)/2^nPlanes of
    * the corpus per query. */
  def annTopK(corpus0: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nPlanes: Int = 10, excludeSelf: Boolean = true): DataFrame = {
    val corpus = Par.ensure(corpus0)
    val bucketed = corpus.withColumn("__b", signature(col(vecCol), nPlanes))
    // query probes: own bucket + 1-bit flips
    val probes = queries
      .withColumn("__sig", signature(col(qVecCol), nPlanes))
      .withColumn("__b", explode(array(
        col("__sig") +: (0 until nPlanes).map(p => col("__sig").bitwiseXOR(lit(1L << p))): _*)))
      .drop("__sig")
    var cands = bucketed.join(broadcast(probes), "__b")
    if (excludeSelf) cands = cands.filter(col(idCol) =!= col(qIdCol))
    val scored = cands
      .withColumn("cosine", cosine(col(vecCol), col(qVecCol)))
      // a (query, candidate) pair can match in several probe buckets
      .groupBy(col(qIdCol), col(idCol))
      .agg(max("cosine").as("cosine"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }
}
