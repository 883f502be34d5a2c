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
}
