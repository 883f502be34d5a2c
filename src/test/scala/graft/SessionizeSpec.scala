package graft

import graft.operators.Sessionize
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (1L, 11L, ts("2024-01-01 10:10:00")), // same session (gap 10 min)
    (1L, 12L, ts("2024-01-01 12:00:00")), // new session (gap > 30 min)
    (2L, 20L, ts("2024-01-01 09:00:00"))
  ).toDF("user_id", "event_id", "ts")

  test("batch sessionization: gap splits sessions; boundaries deterministic") {
    val s = Sessionize.sessions(events, "user_id", "ts", "event_id", gapSeconds = 1800)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(s == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("single Exchange for the two window passes (lag + cumsum share the sort)") {
    val plan = Sessionize.withSessionId(events, "user_id", "ts", "event_id", 1800)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan)
  }

  test("streaming sessionization closes sessions on gap within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = Streams.sessionizeStream(mem.toDS(), gapSeconds = 1800, idleTimeout = false)
    val q = out.toDF().toDF("user_id", "n_events", "start", "end")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // one user: two events in-session, then a far event -> closes session 1
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
        (1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
      assert(rows == Seq((1L, 2L))) // first session emitted; second still open state
    } finally q.stop()
  }

  test("property: sessions == in-memory gap-scan model (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val base = ts("2024-01-01 00:00:00").getTime
    val gen = for {
      n <- Gen.choose(1, 18)
      evs <- Gen.listOfN(n, for {
        u <- Gen.oneOf(1L, 2L)
        sec <- Gen.choose(0, 600) // duplicate timestamps likely
      } yield (u, sec))
      gap <- Gen.oneOf(30L, 60L, 120L)
    } yield (evs, gap)
    val prop = Prop.forAll(gen) { case (evs, gap) =>
      val df = evs.zipWithIndex.map { case ((u, sec), i) =>
        (u, i.toLong, new Timestamp(base + sec * 1000L))
      }.toDF("user_id", "event_id", "ts")
      val got = Sessionize.sessions(df, "user_id", "ts", "event_id", gap)
        .select("user_id", "session_id", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      // model: per user, sort by (ts, event_id), new session when the gap
      // to the PREVIOUS event exceeds `gap` seconds
      val want = evs.zipWithIndex.map { case ((u, sec), i) => (u, sec, i.toLong) }
        .groupBy(_._1).flatMap { case (u, es) =>
          val sorted = es.sortBy(e => (e._2, e._3))
          var sid = 0L
          var prev = Long.MinValue / 2
          val counts = scala.collection.mutable.Map[Long, Long]()
          sorted.foreach { case (_, sec, _) =>
            if (sec - prev > gap) sid += 1
            prev = sec
            counts(sid) = counts.getOrElse(sid, 0L) + 1
          }
          counts.map { case (s, n) => (u, s, n) }
        }.toSet
      (got == want) :| s"evs=$evs gap=$gap got=$got want=$want"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
