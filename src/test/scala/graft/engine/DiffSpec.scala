package graft.engine

import graft.SparkTestBase

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged, null payloads safely") {
    val old = Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20),
      (3L, None: Option[String], 30), (4L, Some("d"), 40)
    ).toDF("id", "tag", "x")
    val neu = Seq(
      (1L, Some("a"), 10),               // unchanged
      (2L, Some("B"), 20),               // changed (value)
      (3L, Some("c"), 30),               // changed (null -> value)
      (5L, None: Option[String], 50)     // added (with a null payload field)
    ).toDF("id", "tag", "x")
    val got = Diff.diff(old, neu, "id")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))

    val summary = Diff.diffSummary(old, neu, "id")
      .as[(String, Long)].collect().toMap
    assert(summary == Map("unchanged" -> 1L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("diff rejects mismatched schemas") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((1L, "x")).toDF("id", "w")
    intercept[IllegalArgumentException] { Diff.diff(a, b, "id") }
  }
}
