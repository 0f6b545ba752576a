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
      "x1_token_count",         // wants map-only, no shuffle
      "d2_minhash_signatures",  // wants map-only after codegen rewrite
      "q_scalar_subquery",      // wants broadcast nested-loop, lazy agg
      "del_mor_position")       // wants anti-join on (_file,_pos)

    for (name <- interesting) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute THIS queryExecution (a noop write would plan a copy):
      // under AQE the pre-execution plan is a placeholder
      // (isFinalPlan=false) that hides codegen spans and the real joins
      df.collect()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val finalPlan = df.queryExecution.executedPlan.toString
      println(s"\n======== $name ========")
      println(formatted.take(4000))
      println("---- final (post-AQE) ----")
      println(finalPlan.take(2500))
      // the `*(n)` operator prefix marks a WholeStageCodegen span
      val codegenSpans =
        "\\*\\((\\d+)\\)".r.findAllMatchIn(finalPlan).map(_.group(1)).toSet.size
      val checks = Seq(
        "PushedFilters" -> formatted.contains("PushedFilters: ["),
        "BroadcastJoin" -> (finalPlan.contains("BroadcastHashJoin") ||
          finalPlan.contains("BroadcastNestedLoopJoin")),
        s"WholeStageCodegenSpans=$codegenSpans" -> (codegenSpans > 0),
        "Exchange" -> finalPlan.contains("Exchange"))
      println("CHECKS " + name + ": " +
        checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
