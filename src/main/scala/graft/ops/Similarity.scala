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

  /** Cosine via the native codegen kernel (VectorExprs.CosineExpr): one
    * fused pass, stays in whole-stage codegen — the HOF formulation
    * (aggregate/zip_with) is CodegenFallback and walks the arrays three
    * times. Same math, same left-to-right accumulation order. */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosine(a, b)

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

  /** Random-hyperplane LSH signature (nPlanes bits) of a vector column.
    * `table` selects an independent plane set — the OR-amplification
    * tables of classic E2LSH-style search. Computed by the native
    * codegen kernel (SignatureExpr): one vector traversal for all
    * planes; bit-exact with the HOF formulation below. */
  def signature(vec: Column, nPlanes: Int, table: Int = 0): Column =
    VectorExprs.signature(vec, nPlanes, table)

  /** The HOF reference formulation of [[signature]] — kept as the
    * equality oracle for the kernel (pinned in OpsSpec). */
  private[graft] def signatureHof(vec: Column, nPlanes: Int, table: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(table * 10007 + p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** JVM-global centroid cache: a fitted coarse quantizer is an artifact
    * of the CORPUS, not of the query — refitting per query (or per
    * session) wastes ~10 KMeans jobs. Keyed by caller-chosen identity
    * (table uuid + snapshot, or a dataset path). Survives SparkSession
    * restarts: centroids are plain doubles. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
  /** Diagnostic/test hook: total quantizer fits performed in this JVM. */
  val quantizerFits = new java.util.concurrent.atomic.AtomicLong()

  /** Nearest-centroid cell by squared euclidean distance via the native
    * codegen kernel (NearestCellExpr) — assignment needs no model
    * object, no per-row UDF, and stays in whole-stage codegen. */
  private def nearestCell(vec: Column, cents: Seq[Seq[Double]]): Column =
    VectorExprs.nearestCell(vec, cents.map(_.toArray).toArray)

  /** The HOF reference formulation of [[nearestCell]] — kept as the
    * equality oracle for the kernel (pinned in OpsSpec). */
  private[graft] def nearestCellHof(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val centLit = typedlit(cents)
    aggregate(
      sequence(lit(0), lit(cents.length - 1)),
      struct(lit(-1).as("i"), lit(Double.MaxValue).as("d")),
      (acc, i) => {
        val c = element_at(centLit, i + 1)
        val d = aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)),
          lit(0.0d), (a, x) => a + x)
        when(d < acc.getField("d"), struct(i.as("i"), d.as("d"))).otherwise(acc)
      }
    ).getField("i")
  }

  private def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy("cell").collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray)

  private def saveCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String, cents: Array[Array[Double]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Deterministic coarse-quantizer fit: a driver-side Lloyd loop over a
    * PARTITION-INVARIANT sample. The sample is the `sampleSize` rows with
    * the smallest `xxhash64(id)` (ties broken by id) — a uniform
    * hash-sample whose membership and order are identical under any
    * parquet split packing, `defaultParallelism`, or file layout, unlike
    * an unordered `limit` (whose rows follow partition order). The loop
    * itself runs on the driver in sample order, so double accumulation
    * order is fixed too — the centroids are bit-identical in every
    * environment. Sample work is bounded (`sampleSize` × dim doubles, a
    * top-k selection on the cluster), so at 100 TB the fit cost is
    * constant and amortized across all queries via the centroid cache.
    *
    * Replaces the ML KMeans fit, whose k-means|| init sampled the corpus
    * through its partition layout — same seed, different environment,
    * different centroids. */
  private[graft] def fitQuantizer(corpus: DataFrame, idCol: String,
      vecCol: String, nClusters: Int, sampleSize: Int = 65536,
      maxIter: Int = 10): Array[Array[Double]] = {
    // TakeOrderedAndProject returns up to `limit` rows PER TASK to the
    // driver merge — tasks x sampleSize x dim doubles blew the 1 GiB
    // driver maxResultSize at sf100 (30 tasks x 64k x 128 doubles).
    // Pre-cut by a deterministic hash threshold sized from the corpus
    // count so roughly 4x the sample survives CORPUS-WIDE: membership
    // stays partition-invariant (pure function of the id hash and the
    // count), and the driver merge receives O(sample), not
    // O(tasks x sample). The 4x margin makes a shortfall below
    // sampleSize vanishingly unlikely on a uniform 64-bit hash; if one
    // ever occurred the fit would just use a (still deterministic)
    // smaller sample.
    val n = corpus.count()
    val base = corpus
      .select(xxhash64(col(idCol)).as("__h"), col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
    val margin = 4L
    val prefiltered =
      if (n <= sampleSize.toLong * margin) base
      else {
        val frac = (sampleSize.toLong * margin).toDouble / n
        val cut = (Long.MinValue.toDouble + frac * 1.8446744073709552e19).toLong
        base.filter(col("__h") <= cut)
      }
    val rows = prefiltered
      .orderBy(col("__h"), col("__id"))
      .limit(sampleSize)
      .select("__v")
      .collect()
    val pts: Array[Array[Double]] =
      rows.map(_.getAs[scala.collection.Seq[Double]]("__v").toArray)
    require(pts.nonEmpty, "cannot fit a quantizer on an empty corpus")
    val k = math.min(nClusters, pts.length)
    val dim = pts(0).length
    // init: evenly spaced points in the hash-shuffled order ≈ a uniform
    // random pick, but a deterministic one
    val cents = Array.tabulate(k)(i => pts((i.toLong * pts.length / k).toInt).clone())
    val assign = new Array[Int](pts.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      // assignment: nearest centroid by squared euclidean, ties → lowest
      // cell (same rule as NearestCellExpr / nearestCellHof). The
      // per-point search is pure (each index writes only its own slot),
      // so running it on the common pool is DETERMINISM-SAFE — only the
      // accumulation below is order-sensitive, and that stays serial.
      // Parallelism matters once nClusters is corpus-sized (semDedup's
      // sqrt(n) sizing): the k x sample x dim x iters fit cost is the
      // driver's one heavy loop.
      val anyMoved = new java.util.concurrent.atomic.AtomicBoolean(false)
      java.util.stream.IntStream.range(0, pts.length).parallel().forEach { p =>
        val v = pts(p)
        var best = -1; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val ct = cents(c)
          var d = 0.0; var j = 0
          while (j < dim) { val x = v(j) - ct(j); d += x * x; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; anyMoved.set(true) }
      }
      moved = anyMoved.get()
      if (iter == 0) moved = true // first pass always recomputes means
      // means in sample order (fixed summation order); empty cluster
      // keeps its previous centroid
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      var p = 0
      while (p < pts.length) {
        val c = assign(p); val v = pts(p)
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
        counts(c) += 1
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      iter += 1
    }
    cents
  }

  /** Corpus-sized coarse-quantizer cell count for cluster-then-compare
    * work ([[semDedup]]): k = sqrt(n/2) balances the two corpus-sized
    * costs — per-row assignment is O(k·dim) and within-cluster pairing
    * is O((n/k)·dim) — so total work grows as n^1.5, never n². Any
    * FIXED k is wrong for some corpus size (the d5 plane-count lesson):
    * occupancy n/k, and with it the pair volume, grows linearly with
    * the corpus. Floor of 16 keeps tiny corpora clustered at all. */
  def autoClusters(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n / 2.0)).toInt)

  /** Resolve the coarse quantizer for a corpus: JVM cache, then sidecar
    * parquet, then a fresh [[fitQuantizer]] fit on a bounded,
    * partition-invariant sample — the quantizer needs cluster SHAPE, not
    * every row; at corpus scale a full fit would dominate, and a
    * layout-dependent sample would make the centroids differ between
    * environments. Shared by [[ivfTopK]] and [[semDedup]] so both treat
    * the quantizer as one persistent per-corpus artifact. */
  /** The resolved quantizer as plain values — lets an external oracle
    * (Verify's DuckDB recompute of d10) score against the SAME centroid
    * artifact the engine used, while recomputing assignment/pairs/
    * survivors independently. */
  private[graft] def centroidsFor(corpus: DataFrame, idCol: String,
      vecCol: String, nClusters: Int, cacheKey: Option[String] = None,
      persistPath: Option[String] = None): Seq[Seq[Double]] =
    quantizerFor(corpus, idCol, vecCol, nClusters, cacheKey, persistPath)

  private def quantizerFor(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, cacheKey: Option[String],
      persistPath: Option[String]): Seq[Seq[Double]] = {
    val spark = corpus.sparkSession
    val cents: Array[Array[Double]] =
      cacheKey.flatMap(key => Option(centroidCache.get(key)))
        .orElse(persistPath
          .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
          .map(p => loadCentroids(spark, p)))
        .getOrElse {
          quantizerFits.incrementAndGet()
          val c = fitQuantizer(corpus, idCol, vecCol, nClusters)
          persistPath.foreach(p => saveCentroids(spark, p, c))
          c
        }
    cacheKey.foreach(key => centroidCache.putIfAbsent(key, cents))
    cents.map(_.toSeq).toSeq
  }

  /** SemDeDup (the public cluster-then-compare recipe, Abbas et al.
    * 2023, arXiv:2303.09540): assign every embedding to its nearest
    * coarse-quantizer centroid, compare pairs ONLY within a cluster, and
    * drop each vector that has a more-senior (lower-id) near-duplicate
    * at cosine >= threshold. Returns the DROP LIST — one row per
    * eliminated vector with its cluster, its smallest LOWER-ID
    * near-duplicate as the witness (deterministic; the witness may
    * itself be dropped — near-dup chains are not transitive, so the
    * witness is evidence for the drop, not necessarily a survivor),
    * and that pair's cosine.
    *
    * This is the embedding-space answer to the quadratic-pair problem
    * the text side solves with LSH banding (d3) and PPJoin prefixes
    * (d7): with nClusters sized to the corpus (occupancy n/k bounded),
    * the within-cluster self-join generates O(n * occupancy) candidate
    * pairs instead of O(n^2) — the design point of the SemDeDup paper.
    * The only shuffles are the two cluster-keyed exchanges feeding the
    * self-join and the final per-vector min; centroids are broadcast. */
  def semDedup(corpus0: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, threshold: Double,
      cacheKey: Option[String] = None,
      persistPath: Option[String] = None): DataFrame = {
    val corpus = Par.ensure(corpus0)
    val centSeq =
      quantizerFor(corpus, idCol, vecCol, nClusters, cacheKey, persistPath)
    val assigned = corpus.select(col(idCol), col(vecCol),
      nearestCell(col(vecCol), centSeq).as("cluster"))
    val lhs = assigned.select(col("cluster"), col(idCol).as("__a"),
      col(vecCol).as("__va"))
    val rhs = assigned.select(col("cluster"), col(idCol).as("__b"),
      col(vecCol).as("__vb"))
    lhs.join(rhs, Seq("cluster"))
      .filter(col("__a") < col("__b"))
      .withColumn("__cos", cosine(col("__va"), col("__vb")))
      .filter(col("__cos") >= threshold)
      // the dropped vector keeps ONE witness: its smallest LOWER-ID
      // near-duplicate (min on (a, cos) structs — a is unique per group;
      // the witness may itself be dropped, see scaladoc)
      .groupBy(col("__b"))
      .agg(min(col("cluster")).as("cluster"), // constant per group (one cell per vector)
        min(struct(col("__a"), col("__cos"))).as("__m"))
      .select(col("__b").as(idCol), col("cluster"),
        col("__m.__a").as("dup_of"), col("__m.__cos").as("cosine"))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * each vector assigned to its nearest centroid ONCE; queries probe the
    * `nProbe` nearest centroids and run exact cosine only within those
    * cells. The classic big-corpus scale path: corpus work is one
    * clustering pass + one assignment column, per-query work is
    * nProbe/nClusters of the data. Centroids are tiny and broadcast.
    *
    * `cacheKey` / `persistPath` make the quantizer a persistent corpus
    * artifact: pass the owning table's uuid+snapshot (or dataset path) as
    * the key and a sidecar location to skip the KMeans fit on every run
    * after the first — at 100 TB the fit is amortized across all queries
    * against that snapshot. */
  def ivfTopK(corpus0: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nClusters: Int = 64, nProbe: Int = 8,
      excludeSelf: Boolean = true,
      cacheKey: Option[String] = None,
      persistPath: Option[String] = None): DataFrame = {
    val spark = corpus0.sparkSession
    val corpus = Par.ensure(corpus0)
    val centSeq =
      quantizerFor(corpus, idCol, vecCol, nClusters, cacheKey, persistPath)
    val assigned = corpus.withColumn("__cell", nearestCell(col(vecCol), centSeq))
    // centroid table: tiny (nClusters rows), broadcast to rank cells/query
    import spark.implicits._
    val centroids = centSeq.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("__cell", "__centroid")
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
    * `probeBits`-or-fewer bit-flip neighbor buckets (multi-probe), exact
    * cosine within the candidate set. `nTables` independent plane sets
    * OR-amplify recall (candidate = same/adjacent bucket in ANY table) at
    * proportional candidate cost — the standard L-tables LSH trade.
    *
    * nPlanes <= 0 (the scale default) sizes the signature from the corpus
    * (Dedup.autoPlanes): planes = log2(count/64), so expected bucket
    * occupancy stays ~64 at ANY corpus size and the per-query candidate
    * volume is ~64 x probes x tables — a CONSTANT per query, instead of
    * the n/2^planes-per-bucket growth fixed planes give. Wider signatures
    * lower per-bucket recall, so the auto path pairs with 2-bit probing
    * (probes/table = 1 + P + C(P,2)) to hold recall.
    *
    * Scale shape: the per-table bucketing is MAP-ONLY on the corpus
    * (explode ×nTables, no shuffle — probes broadcast); the only shuffle
    * is the final per-(query,candidate) max + top-k window. */
  def annTopK(corpus0: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nPlanes: Int = 10, nTables: Int = 1,
      excludeSelf: Boolean = true, probeBits: Int = 1): DataFrame = {
    val corpus = Par.ensure(corpus0)
    val planes = if (nPlanes > 0) nPlanes else Dedup.autoPlanes(corpus.count())
    val cands = annCandidates(corpus, queries, idCol, vecCol, qIdCol, qVecCol,
      planes, nTables, excludeSelf, probeBits)
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

  /** Candidate (corpus row, query) pairs of [[annTopK]] before scoring —
    * factored out so units can pin the per-query candidate volume. */
  private[graft] def annCandidates(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      nPlanes: Int, nTables: Int, excludeSelf: Boolean,
      probeBits: Int): DataFrame = {
    val bucketed = corpus.withColumn("__tb", explode(array(
      (0 until nTables).map(t =>
        struct(lit(t).as("t"), signature(col(vecCol), nPlanes, t).as("b"))): _*)))
      .withColumn("__t", col("__tb.t")).withColumn("__b", col("__tb.b"))
      .drop("__tb")
    // probe masks: identity, every 1-bit flip, and (probeBits >= 2) every
    // 2-bit flip — masks are plain longs, XOR'd onto the signature column
    val masks: Seq[Long] = 0L +:
      ((0 until nPlanes).map(p => 1L << p) ++
        (if (probeBits >= 2)
          for { p <- 0 until nPlanes; q <- p + 1 until nPlanes }
            yield (1L << p) | (1L << q)
        else Nil))
    // query probes per table: signatures computed once into ONE array
    // column, then the (table, mask) cross expanded by exploding the
    // table index and a LITERAL mask array, XOR applied to the exploded
    // scalars. The naive formulation — one explode over nTables×|masks|
    // inline structs (632 at 8 tables / 12 planes / 2-bit probing) —
    // generates >64 KB of code for the Generate's consume method, janino
    // refuses to compile it, and Spark silently drops the whole stage to
    // interpreted mode at exactly the corpus sizes where speed matters
    // (masks grow ~planes², planes grow with log corpus). This shape
    // keeps every generated method a few expressions regardless of
    // tables/planes/probeBits.
    val probes = queries
      .withColumn("__sigs", array((0 until nTables)
        .map(t => signature(col(qVecCol), nPlanes, t)): _*))
      .withColumn("__t", explode(array((0 until nTables).map(lit): _*)))
      .withColumn("__m", explode(lit(masks.toArray)))
      .withColumn("__b",
        element_at(col("__sigs"), col("__t") + 1).bitwiseXOR(col("__m")))
      .drop("__sigs", "__m")
    val cands = bucketed.join(broadcast(probes), Seq("__t", "__b"))
    if (excludeSelf) cands.filter(col(idCol) =!= col(qIdCol)) else cands
  }
}
