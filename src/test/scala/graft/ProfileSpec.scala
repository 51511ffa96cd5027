package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("dq1: nulls, duplicates, and row counts land in the right profile cells") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(1L), None),
      (Some(2L), Some("b")),
      (None, Some("b"))
    ).toDF("id", "tag")
    val rows = Profile
      .profile(df)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows("id") == ((4L, 3L, 2L)))  // 4 rows, 1 null, distinct {1, 2}
    assert(rows("tag") == ((4L, 3L, 2L))) // 4 rows, 1 null, distinct {a, b}
  }

  test("dq1 tolerates hostile column names (spaces, dots, quotes, backticks)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("a b", "it's.`odd`")
    val rows = Profile
      .profile(df)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3))
      .toMap
    assert(rows == Map("a b" -> 2L, "it's.`odd`" -> 2L))
  }

  test("dq1 on real events: keys are unique, types are the known five") {
    val rows = Profile
      .profileEvents(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (n, nnId, ndId) = rows("event_id")
    assert(nnId == n && ndId == n) // event_id is a dense unique key
    assert(rows("event_type")._3 == 5L)
    assert(rows.keySet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
