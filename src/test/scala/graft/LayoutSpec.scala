package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderValue interleaves bits at the documented positions") {
    // hand-computed Morton codes, bit i of column j at position i*n + j
    val df = Seq((1L, 1L), (2L, 1L), (3L, 3L), (0L, 0L), (5L, 2L))
      .toDF("x", "y")
      .withColumn("z", Layout.zorderValue(Seq(col("x"), col("y")), bits = 3))
    val got = df.select("x", "y", "z").as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => ((x, y), z) }.toMap
    def morton(x: Long, y: Long): Long =
      (0 until 3).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    for (((x, y), z) <- got) assert(z == morton(x, y), s"($x,$y)")
    // spot values: (1,1) -> 3, (2,1) -> 6, (3,3) -> 15
    assert(morton(1, 1) == 3 && morton(2, 1) == 6 && morton(3, 3) == 15)
  }

  test("zorderValue preserves locality ordering within one column") {
    // with y fixed, z must be monotone in x
    val df = (0L until 32L).map(x => (x, 7L)).toDF("x", "y")
      .withColumn("z", Layout.zorderValue(Seq(col("x"), col("y")), bits = 5))
    val zs = df.orderBy("x").select("z").as[Long].collect()
    assert(zs.sliding(2).forall(p => p(0) < p(1)))
  }

  test("withZValue normalizes by exact integer min/max division") {
    val df = Seq((100L, 10L), (200L, 20L), (300L, 30L)).toDF("a", "b")
    val z = Layout.withZValue(df, Seq("a", "b"), bits = 4)
    // grid(a): (v-100)*15/200 -> 0, 7, 15; grid(b): 0, 7, 15
    val got = z.orderBy("a").select("__z").as[Long].collect()
    def morton(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    assert(got.toSeq == Seq(morton(0, 0), morton(7, 7), morton(15, 15)))
  }

  test("withZValue: constant column maps to grid zero, null yields null") {
    val df = Seq((Some(1L), 5L), (Some(9L), 5L), (None, 5L)).toDF("a", "b")
    val z = Layout.withZValue(df, Seq("a", "b"), bits = 4)
    assert(z.filter(col("a").isNull).select("__z").collect().head.isNullAt(0))
    // b constant -> grid 0 contributes nothing; z = interleave(grid(a), 0)
    val nn = z.filter(col("a") === 1L).select("__z").as[Long].collect().head
    assert(nn == 0L)
  }

  test("withZValue rejects colliding output column and overflow ranges") {
    val df = Seq((1L, 2L)).toDF("a", "__z")
    intercept[IllegalArgumentException] {
      Layout.withZValue(df, Seq("a"), bits = 4)
    }
    val wide = Seq((0L, 0L), (Long.MaxValue / 2, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Layout.withZValue(wide, Seq("a", "b"), bits = 16)
    }
  }

  test("writeZOrdered tightens per-file bounding boxes on both columns") {
    // two independent uniform keys: round-robin files span ~the full range
    // on both; z-ordered files must be materially tighter on average.
    val n = 4096
    val rows = (0 until n).map { i =>
      // splitmix-ish deterministic scatter so the two keys are independent
      val h = java.lang.Long.reverse(i.toLong * 0x9E3779B97F4A7C15L)
      (math.floorMod(h, 1024L), math.floorMod(h >> 17, 1024L))
    }
    val df = rows.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.writeZOrdered(df, s"$dir/z", Seq("x", "y"), bits = 10, numFiles = 16)
    df.repartition(16).write.parquet(s"$dir/plain")
    def avgSpan(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).as[(Double, Double)].collect().head
      spans
    }
    val (zx, zy) = avgSpan(s"$dir/z")
    val (px, py) = avgSpan(s"$dir/plain")
    // plain round-robin files span nearly the whole 0..1023 range
    assert(px > 900 && py > 900, s"plain spans ($px, $py)")
    // z-ordered files are contiguous curve segments: much tighter boxes
    assert(zx < px * 0.5 && zy < py * 0.5, s"z spans ($zx, $zy) vs ($px, $py)")
  }
}
