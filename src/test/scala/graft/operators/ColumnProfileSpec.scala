package graft.operators

import graft.SparkSpec

class ColumnProfileSpec extends SparkSpec {

  test("profile counts nulls and exact distincts per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(1L), Some("b")),
      (Some(2L), None),
      (None, Some("b")),
      (None, None))
      .toDF("x", "y")

    val got = ColumnProfile.profile(df, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq(("x", 2L, 2L), ("y", 2L, 2L)))

    intercept[IllegalArgumentException] {
      ColumnProfile.profile(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ColumnProfile.profile(df, Seq("x", "x"))
    }

    val empty = ColumnProfile.profile(df.where("false"), Seq("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(empty === Array(("x", 0L, 0L)))
  }

  test("expectations: every rule kind counts its violations exactly") {
    import spark.implicits._
    import ColumnProfile._
    val df = Seq(
      // (id, grade, score, code)
      (1L, Option("A"), Option(10.0), "X1"),
      (2L, Option("B"), Option(200.0), "X2"),   // score out of range
      (3L, None, Option(20.0), "Y3"),           // null grade, bad code
      (2L, Option("Z"), None, "X4"),            // dup id, grade not in set
      (5L, Option("A"), Option(-5.0), "X5")     // score out of range
    ).toDF("id", "grade", "score", "code").repartition(3)
    val got = expectations(df, Seq(
        NotNull("grade"),
        InRange("score", 0.0, 100.0),
        InSet("grade", Seq("A", "B")),
        MatchesRe("code", "^X[0-9]$"),
        Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    assert(got === Map(
      "not_null(grade)" -> (1L, 0),
      "in_range(score, 0.0, 100.0)" -> (2L, 0), // null score NOT counted
      "in_set(grade, A|B)" -> (1L, 0),          // null grade NOT counted
      "matches(code)" -> (1L, 0),
      "unique(id)" -> (1L, 0)))
    // all-pass suite on the clean subset
    val clean = expectations(df.where("id = 1"),
        Seq(NotNull("grade"), Unique(Seq("id"))))
      .collect().map(_.getInt(2)).toSeq
    assert(clean === Seq(1, 1))
    intercept[IllegalArgumentException] {
      expectations(df, Seq(NotNull("grade"), NotNull("grade")))
    }
  }
}
