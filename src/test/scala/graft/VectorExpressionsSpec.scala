package graft

import graft.expressions.VectorExpressions._
import org.apache.spark.sql.functions._

/** Native codegen'd vector expressions: parity with the composed-builtin
  * forms, null handling, and rounding semantics.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("quantizedDot matches the round()-based builtin composition") {
    val df = Seq((Array(0.0015f, -0.9994f, 0.5f), Array(1.0f, 2.0f, -3.0f))).toDF("a", "b")
    def builtin = {
      def q(c: org.apache.spark.sql.Column) = round(c.cast("double") * 1000).cast("long")
      aggregate(zip_with(col("a"), col("b"), (x, y) => q(x) * q(y)),
        lit(0L), (acc, v) => acc + v)
    }
    val (native, composed) = df.select(
      quantizedDot(col("a"), col("b")).as("n"), builtin.as("c"))
      .as[(Long, Long)].head()
    assert(native == composed)
  }

  test("quantizedDot rounds ties away from zero (Spark round / DuckDB parity)") {
    val df = Seq((Array(0.0125, -0.0125), Array(1.0, 1.0))).toDF("a", "b")
    // 0.0125*1000 = 12.5 -> 13; -12.5 -> -13; dot = 13*1000 - 13*1000 = 0
    val v = df.select(quantizedDot(col("a"), col("b")).as("d")).as[Long].head()
    assert(v == 0L)
    val df2 = Seq((Array(0.0125), Array(1.0))).toDF("a", "b")
    assert(df2.select(quantizedDot(col("a"), col("b"))).as[Long].head() == 13L * 1000)
  }

  test("cosineSim: known values, zero-norm null, null input null") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 0.0f))
    ).toDF("a", "b")
    val got = df.select(cosineSim(col("a"), col("b")).as("c")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(1.0))
    assert(got(1).contains(0.0))
    assert(got(2).isEmpty) // zero norm -> null
    val withNull = Seq((Option.empty[Array[Float]], Array(1.0f))).toDF("a", "b")
    assert(withNull.select(cosineSim(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("lshBandSignatures: sign semantics, band count, codegen/interpreted parity") {
    val planes = Array(
      Array(1.0, 0.0),  // band 0 bit 0: sign of x
      Array(0.0, 1.0),  // band 0 bit 1: sign of y
      Array(-1.0, 0.0), // band 1 bit 0: sign of -x
      Array(1.0, 1.0))  // band 1 bit 1: sign of x+y
    val df = Seq((1L, Array(2.0f, -3.0f))).toDF("id", "v")
    val sigs = df.select(lshBandSignatures(col("v"), planes, 2).as("s"))
      .as[Seq[Long]].head()
    // band 0: x>0 -> bit0; y<0 -> no bit1 => 1. band 1: -x<0; x+y<0 => 0.
    assert(sigs == Seq(1L, 0L))
    // interpreted path (expression eval outside codegen) agrees
    val interpreted = graft.expressions.LshBandSignatures(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, -3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      planes, 2)
    val got = interpreted.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData]
    assert(got.toLongArray.toSeq == Seq(1L, 0L))
  }

  test("property: native dot/cosine match scala ground truth on 100 random vectors") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(100)(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1), Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val got = rows.toDF("id", "a", "b")
      .select(col("id"),
        graft.expressions.VectorExpressions.lshBandSignatures(col("a"),
          Array(Array.fill(16)(0.5)), 1).getItem(0).as("sig"),
        cosineSim(col("a"), col("b")).as("cos"))
      .orderBy("id").collect()
    rows.zip(got).foreach { case ((_, a, b), r) =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(y => y.toDouble * y.toDouble).sum)
      assert(math.abs(r.getDouble(2) - dot / (na * nb)) < 1e-9)
      val proj = a.map(_.toDouble * 0.5).sum
      assert(r.getLong(1) == (if (proj > 0) 1L else 0L)) // sign bit ground truth
    }
  }

  test("dotsArgmax is bit-equivalent to the HOF argmax it replaced (200 random vectors)") {
    // the r9 swap in Similarity.ivfAssignTo rests on this equivalence:
    // ascending-index double summation + Double.compare ties must equal
    // array_position(array(HOF dots), array_max(...)) - 1 on every input
    val rnd = new scala.util.Random(7)
    val planes = Array.tabulate(8)(p =>
      Array.tabulate(16)(_ => rnd.nextDouble() * 2 - 1))
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.tabulate(16)(_ => (rnd.nextDouble() * 2 - 1).toFloat)))
    val df = rows.toDF("id", "v")
    def hofArgmax = {
      val dots = planes.toIndexedSeq.map { plane =>
        val planeCol = array(plane.toIndexedSeq.map(lit): _*)
        aggregate(zip_with(col("v"), planeCol, (x, h) => x.cast("double") * h),
          lit(0.0), (acc, d) => acc + d)
      }
      val arr = array(dots: _*)
      (array_position(arr, array_max(arr)) - 1).cast("int")
    }
    val mismatches = df.select(col("id"),
        dotsArgmax(col("v"), planes).as("native"), hofArgmax.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0L)
    // quantized int input path too (the SemDedup/IVF assignment shape)
    val qdf = rows.toDF("id", "v")
      .select(col("id"), transform(col("v"),
        x => floor(x.cast("double") * 127 + 0.5).cast("int")).as("v"))
    val qm = qdf.select(col("id"),
        dotsArgmax(col("v"), planes).as("native"), hofArgmax.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(qm == 0L)
  }

  test("expressions run inside whole-stage codegen (no interpreted fallback)") {
    // non-foldable input (range), else the optimizer folds everything locally
    val df = spark.range(1, 2)
      .select(array(col("id").cast("float"), lit(2.0f)).as("a"),
        array(lit(3.0f), lit(4.0f)).as("b"))
      .select(quantizedDot(col("a"), col("b")).as("d"), cosineSim(col("a"), col("b")).as("c"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [quantized_dot"), plan)
    val (d, c) = df.as[(Long, Double)].head()
    assert(d == 1000L * 3000 + 2000L * 4000)
    assert(math.abs(c - 11.0 / (math.sqrt(5) * math.sqrt(25))) < 1e-12)
  }

  test("mixed element types (double vs float) are accepted") {
    val df = Seq((Array(1.0, 2.0), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(quantizedDot(col("a"), col("b"))).as[Long].head() == 11000000L)
  }

  test("integer expressions fail loudly on ragged vectors (no silent truncation)") {
    // ADVICE r7: a vector shorter/longer than the plane dimension used to
    // dot over the common prefix — a plausible partial signature instead of
    // an error. Both the codegen and interpreted paths must throw now.
    val planes = Array(Array(1, -1, 1, -1)) // dim 4
    val short = Seq((1L, Array(1, 2, 3))).toDF("id", "v") // dim 3
    val long2 = Seq((1L, Array(1, 2, 3, 4, 5))).toDF("id", "v") // dim 5
    for (df <- Seq(short, long2)) {
      val e1 = intercept[Exception] {
        df.select(graft.expressions.VectorExpressions
          .intLshBandSignatures(col("v"), planes, 1)).collect()
      }
      assert(e1.toString.contains("plane dimension") ||
        Option(e1.getCause).exists(_.toString.contains("plane dimension")), e1.toString)
      val e2 = intercept[Exception] {
        df.select(graft.expressions.VectorExpressions
          .signedIntDots(col("v"), planes)).collect()
      }
      assert(e2.toString.contains("plane dimension") ||
        Option(e2.getCause).exists(_.toString.contains("plane dimension")), e2.toString)
    }
    // exact-dimension input still works on both
    val ok = Seq((1L, Array(1, 2, 3, 4))).toDF("id", "v")
    assert(ok.select(graft.expressions.VectorExpressions
      .signedIntDots(col("v"), planes).getItem(0)).as[Long].head() == 1 - 2 + 3 - 4)
  }

  test("float LSH signatures fail loudly on ragged vectors too") {
    // Same ADVICE r7 convention as the integer twins above: the float-plane
    // family used to dot over min(len, dim) — a ragged vector signed a
    // plausible partial bucket. Now it throws on both execution paths.
    val planes = Array(Array(1.0, -1.0, 1.0, -1.0)) // dim 4
    val short = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      short.select(graft.expressions.VectorExpressions
        .lshBandSignatures(col("v"), planes, 1)).collect()
    }
    assert(e.toString.contains("plane dimension") ||
      Option(e.getCause).exists(_.toString.contains("plane dimension")), e.toString)
    // exact-dimension input: dot = 1-2+3-4 < 0 → sign bit 0
    val ok = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "v")
    assert(ok.select(graft.expressions.VectorExpressions
      .lshBandSignatures(col("v"), planes, 1).getItem(0)).as[Long].head() == 0L)
    // annLsh keeps only exact-dimension vectors, so a mixed-dimension corpus
    // still runs (ragged rows are excluded, not fatal).
    val mixed = Seq(
      (1L, Array.fill(8)(1.0f)), (2L, Array.fill(8)(1.0f)),
      (3L, Array.fill(5)(1.0f)), (4L, Array.empty[Float])).toDF("id", "vec")
    val cand = graft.operators.Similarity.annLsh(
      mixed, "id", "vec", dim = 8, bands = 2, bitsPerBand = 4, minCosine = 0.5)
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }
}
