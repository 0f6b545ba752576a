package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy map stages: a small table arriving
  * as one parquet split would otherwise pin a 32-core stage to one task
  * (interpreted higher-order text expressions make this very visible).
  * At production scale inputs have many splits and this is a no-op. */
object Par {
  def ensure(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
