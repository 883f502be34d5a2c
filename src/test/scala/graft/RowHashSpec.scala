package graft

import graft.functions.RowHash
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** C4 edge cases (SURVEY.md §5, §7.4 trap 1): null/empty render as the
  * literal "NULL", the string "0" is NOT nullified, columns are hashed in
  * alphabetical order regardless of physical order.
  */
class RowHashSpec extends SparkSpec {
  import spark.implicits._

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("null and empty string render as literal NULL; '0' stays '0'") {
    val df = Seq((null.asInstanceOf[String], "", "0")).toDF("a", "b", "c")
    val got = RowHash.withRowHash(df).select("row_hash").as[String].head()
    assert(got == sha256Hex("NULL|NULL|0"))
  }

  test("columns are hashed in alphabetical name order, not physical order") {
    val df1 = Seq(("x", "y")).toDF("b", "a") // physical order b,a
    val df2 = Seq(("y", "x")).toDF("a", "b") // physical order a,b
    val h1 = RowHash.withRowHash(df1).select("row_hash").as[String].head()
    val h2 = RowHash.withRowHash(df2).select("row_hash").as[String].head()
    assert(h1 == h2 && h1 == sha256Hex("y|x"))
  }

  test("typed values hash as their string cast (ints without decimal point)") {
    val df = Seq((7, 1.5)).toDF("i", "d")
    val got = RowHash.withRowHash(df).select("row_hash").as[String].head()
    assert(got == sha256Hex("1.5|7"))
  }

  test("withAuditColumns: dense 1..n ids in key order, audit schema appended") {
    val df = Seq(("b", 2), ("a", 1), ("c", 3)).toDF("k", "v")
    val out = RowHash.withAuditColumns(df, Seq("k"),
      to_timestamp(lit("2026-01-01 00:00:00")))
    assert(out.columns.toSeq == Seq("id", "k", "v", "row_hash", "created_at", "updated_at"))
    val ids = out.orderBy("k").select("id").as[Long].collect().toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("hash ignores pre-existing audit columns only when caller excludes them") {
    // withRowHash hashes ALL columns by design; the Merge path excludes
    // AuditCols explicitly — assert the two bases agree on a pre-audit frame.
    val df = Seq(("k1", "v1")).toDF("k", "v")
    val viaAll = RowHash.withRowHash(df).select("row_hash").as[String].head()
    val viaList = df.withColumn("row_hash", RowHash.rowHash(Seq("k", "v")))
      .select("row_hash").as[String].head()
    assert(viaAll == viaList)
  }
}
