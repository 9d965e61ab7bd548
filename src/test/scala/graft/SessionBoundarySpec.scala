package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-window boundary semantics that the q_session_gaps
  * oracle encodes: Spark MERGES sessions whose windows touch, so a gap
  * of exactly the gap duration extends the session; only a strictly
  * larger gap starts a new one (verified empirically here — the
  * gaps-and-islands oracle must use `>`, not `>=`).
  */
class SessionBoundarySpec extends AnyFunSuite with SparkFixture {

  private def sessions(ts: Seq[String]): Long = {
    import spark.implicits._
    val df = ts.map(Timestamp.valueOf).map(t => (1L, t)).toDF("user_id", "ts")
    df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)))
      .count()
  }

  test("a gap of exactly 30 minutes merges (touching windows)") {
    assert(sessions(Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00")) === 1)
  }

  test("a gap of 30 minutes plus 1 microsecond starts a new session") {
    assert(sessions(Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00.000001")) === 2)
  }

  test("a gap of 30 minutes minus 1 microsecond extends the session") {
    assert(sessions(Seq("2024-01-01 10:00:00", "2024-01-01 10:29:59.999999")) === 1)
  }

  test("chained sub-gap events merge into one session spanning > gap") {
    assert(sessions(Seq(
      "2024-01-01 10:00:00", "2024-01-01 10:29:00",
      "2024-01-01 10:58:00", "2024-01-01 11:27:00")) === 1)
  }
}
