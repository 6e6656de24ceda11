package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sessionize.assign: gap-based session ordinals — boundary
  * semantics (gap strictly greater than), determinism under ties,
  * and the one-shuffle plan shape.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  test("a gap strictly greater than gapSeconds opens a new session; " +
      "a gap of exactly gapSeconds does not") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", 1L),
      (1L, "2024-01-01 00:30:00", 2L), // exactly 1800s → same session
      (1L, "2024-01-01 01:00:01", 3L), // 1801s → new session
      (2L, "2024-01-01 05:00:00", 4L)) // other key: own session 1
    val got = Sessionize.assign(events, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_n").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("session ordinals restart per key and count every gap") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", 1L),
      (1L, "2024-01-01 02:00:00", 2L),
      (1L, "2024-01-01 04:00:00", 3L),
      (1L, "2024-01-01 04:10:00", 4L))
    val got = Sessionize.assign(events, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_n").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
  }

  test("the two window passes share one Exchange (sessionization's " +
      "minimum data movement)") {
    val events = ev((1L, "2024-01-01 00:00:00", 1L))
    val plan = Sessionize.assign(events, "user_id", "ts", "event_id", 60L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges === 1, "expected exactly one shuffle:\n" + plan.take(1200))
  }
}
