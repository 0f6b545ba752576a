package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted plans for representative queries and
  * greps them for the properties that matter at scale — parquet pushdown
  * (PushedFilters), pruned read schemas, broadcast joins, and
  * whole-stage codegen coverage.
  * Usage: sbt "runMain graft.tools.Explain [sfDir]" */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "s6_scan_filter_project", // wants PushedFilters + 4-col ReadSchema
      "q_join_broadcast",       // wants BroadcastHashJoin
      "q5_join5",               // wants broadcast dims + shuffle facts
      "q1_agg",                 // wants partial agg + WholeStageCodegen
      "x1_token_count")         // wants map-only, no shuffle

    for (name <- interesting) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n======== $name ========")
      println(plan.take(4000))
      val checks = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "WholeStageCodegen" -> plan.contains("WholeStageCodegen"),
        "Exchange" -> plan.contains("Exchange"))
      println("CHECKS " + name + ": " +
        checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
