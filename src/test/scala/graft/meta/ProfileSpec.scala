package graft.meta

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls/distincts per column and renders mixed " +
      "types as strings, in one pass") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(1L), None, Some(2.5)),
      (Some(3L), Some("b"), None),
      (None, Some("a"), Some(-1.0))
    ).toDF("id", "name", "score")
    val p = Profile.profile(df, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getString(6))).toMap
    assert(p("id") === ((4L, 3L, 1L, 2L, "1", "3")))
    assert(p("name") === ((4L, 3L, 1L, 2L, "a", "b")))
    assert(p("score") === ((4L, 3L, 1L, 2L, "-1.0", "2.5")))
  }
}
