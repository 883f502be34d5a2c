package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b limits the dump to
    // those queries. The driver never sets it, so the gate sees everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).filter(_.nonEmpty)
    // A throwing query must leave a committed trace (VERDICT r8 §missing-1:
    // the r8 streaming break produced NO artifact signal — the queries just
    // vanished from CORRECTNESS_r08.json and the diagnosis needed a
    // judge-side sbt test rerun). Collect name→message here and write
    // verify_errors.json next to oracle_sql.json, always (empty {} when
    // clean, so its absence means Verify itself died).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // Second copy at a repo path the driver's end-of-round commit sweeps up
    // (outDir lives in the driver sandbox and vanishes with it). Best-effort:
    // this copy is purely diagnostic, and on a machine without that
    // directory an unguarded write would kill Verify AFTER every query ran
    // (ADVICE r9) — the primary record above already landed in outDir.
    try Files.writeString(Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_ERRORS", "/root/repo/verify_errors.json")), errJson)
    catch { case e: Throwable =>
      System.err.println(s"[verify] secondary verify_errors.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
