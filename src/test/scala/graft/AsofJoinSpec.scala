package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    // (event_id, key, t)
    (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 20L),
    (4L, "b", 10L), (5L, "b", 3L),
    (6L, "c", 7L) // key with no snapshots at all
  ).toDF("event_id", "k", "t")

  private val snaps = Seq(
    // (key, t, price, note)
    ("a", 5L, 100.0, "s1"),   // equal-ts: inclusive for event 1
    ("a", 12L, 200.0, "s2"),
    ("b", 4L, 50.0, "s3")
  ).toDF("k", "t", "price", "note")

  test("asofJoin attaches the latest snapshot at or before each event") {
    val out = AsofJoin.asofJoin(events, snaps, Seq("k"), "t", "t",
        Seq("price", "note"))
      .select("event_id", "asof_price", "asof_note")
      .as[(Long, Option[Double], Option[String])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some(100.0), Some("s1")), // ts tie -> snapshot visible (<= semantics)
      (2L, Some(100.0), Some("s1")), // 10 < 12: still s1
      (3L, Some(200.0), Some("s2")),
      (4L, Some(50.0), Some("s3")),
      (5L, None, None),              // before the first snapshot
      (6L, None, None)               // key never has snapshots; left row kept
    ))
  }

  test("asofJoin matches whole rows: a NULL field never falls back to older") {
    val s2 = Seq(("a", 1L, Some(1.0), Some("old")), ("a", 10L, None, Some("new")))
      .toDF("k", "t", "price", "note")
    val out = AsofJoin.asofJoin(Seq((9L, "a", 15L)).toDF("event_id", "k", "t"),
        s2, Seq("k"), "t", "t", Seq("price", "note"))
      .select("asof_price", "asof_note")
      .as[(Option[Double], Option[String])].collect()
    // latest snapshot row wins atomically: its NULL price stays NULL
    assert(out.toSeq == Seq((None, Some("new"))))
  }

  test("asofJoin rejects output-name collisions with the left side") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(events.withColumnRenamed("event_id", "asof_price"),
        snaps, Seq("k"), "t", "t", Seq("price"))
    }
  }

  test("property: asofJoin equals the brute-force per-row latest (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val keys = Gen.oneOf("a", "b", "c")
    val evGen = Gen.listOfN(25, Gen.zip(keys, Gen.choose(0L, 40L)))
    // snapshot times unique per key (the operator's uniqueness contract)
    val snGen = Gen.mapOf(Gen.zip(Gen.zip(keys, Gen.choose(0L, 40L)),
      Gen.choose(0.0, 9.0)))
    val prop = Prop.forAll(evGen, snGen) { (ev, sn) =>
      val left = ev.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "t")
      val right = sn.toSeq.map { case ((k, t), p) => (k, t, p) }
        .toDF("k", "t", "price")
      val got = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("price"))
        .select("event_id", "asof_price")
        .as[(Long, Option[Double])].collect().toMap
      val want = ev.zipWithIndex.map { case ((k, t), i) =>
        val eligible = sn.filter { case ((sk, st), _) => sk == k && st <= t }
        i.toLong -> eligible.toSeq.sortBy(_._1._2).lastOption.map(_._2)
      }.toMap
      (got == want) :| s"got=$got want=$want"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
