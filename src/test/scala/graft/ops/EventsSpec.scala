package graft.ops

import graft.SparkSpec

/** Semantics pins for the event-sequence operators whose oracle
  * queries only see aggregate histograms: the funnel stage machine's
  * ordering, windowing, and restart rules on hand-built sequences. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def stages(rows: (Long, Long, String, Long)*): Map[Long, Long] =
    Events.funnelStages(
      rows.toDF("user_id", "event_id", "event_type", "sec"))
      .as[(Long, Long)].collect().toMap

  test("funnel: in-window ordered sequence completes; order violations don't") {
    val s = stages(
      // user 1: signup -> click (+100s) -> purchase (+100s): complete
      (1L, 1L, "signup", 1000L), (1L, 2L, "click", 1100L), (1L, 3L, "purchase", 1200L),
      // user 2: click BEFORE signup never counts
      (2L, 4L, "click", 1000L), (2L, 5L, "signup", 1100L), (2L, 6L, "purchase", 1200L),
      // user 3: no signup at all
      (3L, 7L, "click", 1000L), (3L, 8L, "purchase", 1100L))
    assert(s == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
  }

  test("funnel: stage advance must land within the window of the stage entry") {
    val s = stages(
      // user 1: click 1801s after signup — outside the 1800s window
      (1L, 1L, "signup", 1000L), (1L, 2L, "click", 2801L),
      // user 2: click at exactly 1800s — inside (<=)
      (2L, 3L, "signup", 1000L), (2L, 4L, "click", 2800L))
    assert(s == Map(1L -> 1L, 2L -> 2L))
  }

  test("funnel: a fresh signup restarts the window; stage 3 is terminal") {
    val s = stages(
      // user 1: first signup's window expires, but a LATER signup's
      // window catches the click — restart semantics
      (1L, 1L, "signup", 1000L), (1L, 2L, "signup", 10000L),
      (1L, 3L, "click", 10100L), (1L, 4L, "purchase", 10200L),
      // user 2: reaches 3, then a signup must NOT reset it
      (2L, 5L, "signup", 1000L), (2L, 6L, "click", 1100L),
      (2L, 7L, "purchase", 1200L), (2L, 8L, "signup", 1300L),
      // user 3: signup BETWEEN click and purchase resets to stage 1
      (3L, 9L, "signup", 1000L), (3L, 10L, "click", 1100L),
      (3L, 11L, "signup", 1200L), (3L, 12L, "purchase", 1300L))
    assert(s == Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
  }

  test("funnel: same-second events advance in event_id order") {
    val s = stages(
      (1L, 1L, "signup", 1000L), (1L, 2L, "click", 1000L),
      (1L, 3L, "purchase", 1000L))
    assert(s == Map(1L -> 3L))
  }
}
