package graft

import graft.expressions.GraftExtensions
import org.apache.spark.sql.functions._

/** SQL-surface registration of the native vector expressions. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("quantized_dot and cosine_similarity callable from SQL after register") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val d = spark.sql("SELECT quantized_dot(a, b, 1000) AS d FROM vecs").as[Long].head()
    assert(d == 1000L * 3000 + 2000L * 4000)
    val dDefault = spark.sql("SELECT quantized_dot(a, b) AS d FROM vecs").as[Long].head()
    assert(dDefault == d)
    val c = spark.sql("SELECT cosine_similarity(a, b) AS c FROM vecs").as[Double].head()
    assert(math.abs(c - 11.0 / (math.sqrt(5) * math.sqrt(25))) < 1e-12)
  }

  test("extension class injects the same functions at session build time") {
    // same builders the SparkSessionExtensions path injects
    assert(GraftExtensions.functions.map(_._1.funcName).toSet ==
      Set("quantized_dot", "cosine_similarity", "redact_pii",
        "canonicalize_url"))
  }

  test("redact_pii and canonicalize_url callable from SQL after register") {
    GraftExtensions.register(spark)
    Seq((1L, "mail a@b.co or visit HTTP://X.COM:80/p/?utm_a=1#f"))
      .toDF("id", "s").createOrReplaceTempView("txt")
    val r = spark.sql("SELECT redact_pii(s) AS r FROM txt").as[String].head()
    assert(r == "mail <EMAIL> or visit <URL>")
    val c = spark.sql(
      "SELECT canonicalize_url('HTTP://X.COM:80/p/?utm_a=1#f') AS c FROM txt")
      .as[String].head()
    assert(c == "http://x.com/p")
    // SQL path and Scala Column path are THE SAME definition
    val viaCol = Seq("HTTP://X.COM:80/p/?utm_a=1#f").toDF("u")
      .select(graft.operators.TextAnalysis.canonicalizeUrl(col("u")))
      .as[String].head()
    assert(c == viaCol)
  }

  test("NativeVectorRules rewrites the dot fold; semantics preserved exactly") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)),
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)),
      (3L, Array[java.lang.Float](1.0f), Array[java.lang.Float](3.0f, 4.0f))
    ).toDF("id", "a", "b").repartition(2) // block ConvertToLocalRelation folding
    val q = df.select(col("id"),
      graft.operators.Similarity.dot(col("a"), col("b")).as("d"))
    // the optimizer replaced the interpreted fold with the native expression
    assert(q.queryExecution.optimizedPlan.toString.contains("dot_product"),
      q.queryExecution.optimizedPlan.toString)
    val got = q.orderBy("id").collect().map(r =>
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got(0).contains(11.0)) // 1*3 + 2*4
    assert(got(1).isEmpty)        // null element -> null, like the fold
    assert(got(2).isEmpty)        // length mismatch (zip_with null-pad) -> null
    // unregistered session semantics agree (ground truth: the raw fold)
    val plain = df.select(col("id"), aggregate(
        zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
      .orderBy("id").collect().map(r =>
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got.toSeq == plain.toSeq)
  }

  test("streaming enrichWithDim broadcasts the dimension side") {
    import graft.streaming.Streams
    val events = Seq((1L, "click"), (2L, "view")).toDF("user_id", "event_type")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = Streams.enrichWithDim(events, dim, Seq("user_id"))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(out.select("tier").as[String].collect().toSet == Set("gold", "silver"))
  }
}
