package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistorySpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, id, state, value) — u1 changes A→B→B→A (the middle B must
  // collapse), u2 never changes, u3 has one event.
  private def fixture = Seq(
    ("u1", 10L, 1L, "A", 1.0),
    ("u1", 20L, 2L, "B", 2.0),
    ("u1", 30L, 3L, "B", 3.0),
    ("u1", 40L, 4L, "A", 4.0),
    ("u2", 10L, 5L, "X", 5.0),
    ("u2", 50L, 6L, "X", 6.0),
    ("u3", 99L, 7L, "Z", 7.0)
  ).toDF("user_id", "ts", "event_id", "state", "value")

  test("scd2 collapses runs, chains valid_to, flags one current row per key") {
    val out = History.scd2(fixture, Seq("user_id"), col("ts"), col("event_id"),
        Seq("state"))
      .select("user_id", "state", "valid_from", "valid_to", "version",
        "is_current")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4), r.getBoolean(5)))
      .toSet
    assert(out == Set(
      ("u1", "A", 10L, 20L, 1, false),
      ("u1", "B", 20L, 40L, 2, false), // 30L event collapsed into this run
      ("u1", "A", 40L, -1L, 3, true),
      ("u2", "X", 10L, -1L, 1, true), // unchanged key = single open version
      ("u3", "Z", 99L, -1L, 1, true)))
  }

  test("scd2 treats null state null-safely (null→A and A→null are changes)") {
    val df = Seq(
      ("k", 1L, 1L, null.asInstanceOf[String]),
      ("k", 2L, 2L, "A"),
      ("k", 3L, 3L, null.asInstanceOf[String]),
      ("k", 4L, 4L, null.asInstanceOf[String])
    ).toDF("user_id", "ts", "event_id", "state")
    val out = History.scd2(df, Seq("user_id"), col("ts"), col("event_id"),
        Seq("state"))
      .select("state", "valid_from", "version").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(
      (None, 1L, 1), (Some("A"), 2L, 2), (None, 3L, 3)))
  }

  test("snapshotAt returns latest-wins state per key at the cut") {
    val snap = History.snapshotAt(fixture, Seq("user_id"), col("ts"),
        col("event_id"), lit(30L))
      .select("user_id", "state", "ts").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // u3's only event (ts=99) is after the cut — absent entirely
    assert(snap == Set(("u1", "B", 30L), ("u2", "X", 10L)))
  }

  test("cdcDiff classifies I/U/D and drops unchanged keys") {
    val oldS = Seq(("a", "A", 1.0), ("b", "B", 2.0), ("c", "C", 3.0),
      ("d", "D", 4.0)).toDF("k", "state", "value")
    val newS = Seq(("a", "A", 1.0), ("b", "B2", 2.0), ("c", "C", 9.0),
      ("e", "E", 5.0)).toDF("k", "state", "value")
    val out = History.cdcDiff(oldS, newS, Seq("k"), Seq("state", "value"))
      .select("k", "op").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // a unchanged → absent; b state-changed, c value-changed, d deleted, e new
    assert(out == Set(("b", "U"), ("c", "U"), ("d", "D"), ("e", "I")))
  }

  test("cdcDiff is null-safe on attributes (null→value and value→null are U; null=null is unchanged)") {
    val oldS = Seq(("a", null.asInstanceOf[String]), ("b", "B"),
      ("c", null.asInstanceOf[String])).toDF("k", "state")
    val newS = Seq(("a", "A"), ("b", null.asInstanceOf[String]),
      ("c", null.asInstanceOf[String])).toDF("k", "state")
    val out = History.cdcDiff(oldS, newS, Seq("k"), Seq("state"))
      .select("k", "op").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "U"), ("b", "U")))
  }

  test("scd2 plan reuses one exchange for both windows") {
    val plan = History.scd2(fixture, Seq("user_id"), col("ts"),
      col("event_id"), Seq("state")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected a single shuffle, plan:\n$plan")
  }
}
