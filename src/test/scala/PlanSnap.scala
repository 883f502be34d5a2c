import java.nio.file.{Files, Paths}

/** Writes `plans/r17/<query>_<suffix>.txt`: the formatted physical plan of
  * each named query — the before/after evidence for the round-17
  * optimization claims (OPTIMIZATION_r17.md). Usage:
  *
  *   Test/runMain PlanSnap <suffix> <query> [<query> ...]
  *
  * Plans are captured at the bench scale factor (sf0.1) so the shapes match
  * the numbers the optimization round reports; control characters are
  * escaped the PlanDump way so the files stay text.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <suffix> <query> [...]")
    val suffix = args.head
    val spark = graft.SparkSpec.session
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get("plans/r17"))
    args.tail.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val clean = plan.flatMap {
        case c if c == '\n' || c == '\t' => c.toString
        case c if c < ' ' || c == '\u007f' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val p = Paths.get(s"plans/r17/${name}_$suffix.txt")
      Files.writeString(p,
        s"# $name — $suffix (sf: $d)\n\n$clean")
      println(s"wrote $p")
    }
    spark.stop()
  }
}
