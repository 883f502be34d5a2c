/** Ad-hoc: print a query's executed plan. Usage:
  *   Test/runMain PlanCheck <queryName> [sfDir]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(args(0))(spark, d)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
