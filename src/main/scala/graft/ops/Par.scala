package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy map stages: a small table arriving
  * as one parquet split would otherwise pin a 32-core stage to one task
  * (interpreted higher-order text expressions make this very visible).
  * At production scale inputs have many splits and this is a no-op. */
object Par {
  def ensure(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    // count the LEAF input splits from the planned scan instead of
    // forcing a df.rdd plan conversion (which detaches the lineage from
    // Catalyst and costs a planning pass per call)
    // sparkPlan, not executedPlan: under AQE the executed plan is one
    // opaque adaptive node whose leaves hide the scans
    val splits = df.queryExecution.sparkPlan.collectLeaves().map {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDD.getNumPartitions
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
      // a reused exchange is a LEAF whose outputPartitioning reports the
      // exchange's virtual partition count (e.g. 200) — counting it would
      // over-count real input splits and skip a needed repartition
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0
      case other => other.outputPartitioning.numPartitions
    }.sum
    if (splits > 0 && splits < want) df.repartition(want) else df
  }
}
