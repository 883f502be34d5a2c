package graft

import graft.expressions.GraftExtensions

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
      Set("quantized_dot", "cosine_similarity"))
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
