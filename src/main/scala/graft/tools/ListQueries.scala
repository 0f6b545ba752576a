package graft.tools

/** Prints the full SparkEntry query-name list, comma-separated — lets
  * shell harnesses (sf100full.sh) build an exclusion-filtered
  * SPARK_GRAFT_ONLY without hard-coding the suite. */
object ListQueries {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.queries.keys.toSeq.sorted.mkString(","))
}
