package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-keyed DataFrame artifacts (the DataFrame analogue of the IVF
  * centroid sidecar, Similarity.quantizerFor): expensive corpus-derived
  * tables — a verified near-dup pair graph, a flagged-span table — are
  * computed once per (table snapshot, operator params) and reused by
  * every downstream consumer, exactly as a production corpus pipeline
  * materializes dedup artifacts once per snapshot instead of per query.
  *
  * Layout: `path/` holds the parquet result plus a `_sidecar_key` file
  * written AFTER the parquet completes. A missing/mismatched key file
  * (params changed, snapshot advanced, torn write) recomputes and
  * overwrites; a matching key short-circuits to a plain parquet read.
  * The key must therefore encode everything the result depends on —
  * callers use (table uuid, snapshot id, every operator param).
  *
  * Scale note: the artifact is written/read through ordinary
  * distributed parquet IO — nothing driver-sized anywhere. At 100 TB
  * the pair graph / span table are orders of magnitude smaller than the
  * corpus (near-dup pairs and repeated spans, not documents). */
object Sidecar {

  private def keyFile(path: String) =
    new org.apache.hadoop.fs.Path(path, "_sidecar_key")

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Compute-or-load `compute` keyed by `key` at `path`. With `path`
    * None the sidecar is disabled and `compute` runs directly. */
  def dataFrame(spark: SparkSession, key: Option[String],
      path: Option[String])(compute: => DataFrame): DataFrame =
    (key, path) match {
      case (Some(k), Some(p)) =>
        val f = fs(spark, p)
        val kf = keyFile(p)
        val hit =
          try {
            f.exists(kf) && {
              val in = f.open(kf)
              try new String(in.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8) == k
              finally in.close()
            }
          } catch { case _: java.io.IOException => false }
        if (hit) spark.read.parquet(p)
        else {
          // strip column metadata before writing: columns derived from an
          // Iceberg scan carry PARQUET field-id annotations, and two
          // output columns tracing to the SAME source field (id_a/id_b
          // from doc_id) would write duplicate field ids — unreadable
          // under field-id resolution
          val computed = compute
          val clean = computed.select(computed.columns.map(c =>
            org.apache.spark.sql.functions.col(c)
              .as(c, org.apache.spark.sql.types.Metadata.empty)): _*)
          // parquet first, key LAST: a crash between the two leaves a
          // key-less dir that recomputes, never a stale-keyed artifact
          clean.write.mode("overwrite").parquet(p)
          val out = f.create(kf, true)
          try out.write(k.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          spark.read.parquet(p)
        }
      case _ => compute
    }
}
