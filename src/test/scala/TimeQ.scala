/** Ad-hoc: time a query end-to-end. Test/runMain TimeQ <name> <sfDir> */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(args(0))(spark, args(1)).count()
    println(f"[timeq] ${args(0)} rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
