package graft.core

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "t", "state")

  private def run(dim: org.apache.spark.sql.DataFrame) =
    dim.orderBy("user_id", "valid_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq

  test("mergeScd2(build(history), delta) == build(full) across the tricky boundaries") {
    // user 1: history A,A -> delta A (repeat: open row must STAY open)
    // user 2: history A -> delta B,B,C (boundary change + repeat + change)
    // user 3: delta-only user (all-new chain)
    // user 4: history-only user (untouched)
    val history = ev(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "A"),
      (2L, 3L, 10L, "A"),
      (4L, 4L, 15L, "X"))
    val delta = ev(
      (1L, 5L, 100L, "A"),
      (2L, 6L, 100L, "B"), (2L, 7L, 110L, "B"), (2L, 8L, 120L, "C"),
      (3L, 9L, 105L, "Z"))
    val full = history.unionByName(delta)
    val merged = Scd.mergeScd2(
      Scd.buildScd2(history, "user_id", "event_id", "t", "state"),
      delta, "user_id", "event_id", "t", "state")
    val rebuilt = Scd.buildScd2(full, "user_id", "event_id", "t", "state")
    assert(run(merged) === run(rebuilt))
    // and the semantics themselves
    val m = run(merged)
    assert(m === Seq(
      (1L, "A", 10L, None),
      (2L, "A", 10L, Some(100L)),
      (2L, "B", 100L, Some(120L)),
      (2L, "C", 120L, None),
      (3L, "Z", 105L, None),
      (4L, "X", 15L, None)))
  }

  test("same-timestamp delta events break ties on the order column like the rebuild") {
    val history = ev((1L, 1L, 10L, "A"))
    val delta = ev((1L, 2L, 50L, "B"), (1L, 3L, 50L, "C"))
    val merged = Scd.mergeScd2(
      Scd.buildScd2(history, "user_id", "event_id", "t", "state"),
      delta, "user_id", "event_id", "t", "state")
    val rebuilt = Scd.buildScd2(
      history.unionByName(delta), "user_id", "event_id", "t", "state")
    assert(run(merged) === run(rebuilt))
  }
}
