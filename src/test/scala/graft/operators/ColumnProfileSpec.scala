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
}
