package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

/** Edge semantics of the carry-forward as-of join on hand-built frames:
  * inclusive tie at equal timestamps, null when nothing precedes,
  * per-key isolation, and multi-column payload consistency. */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("backward as-of: latest <= match, inclusive ties, null when none") {
    val left = Seq(
      ("u1", ts(100), "p1"), // strictly after r2 → r2
      ("u1", ts(50), "p2"),  // EQUAL to r1's ts → inclusive → r1
      ("u1", ts(10), "p3"),  // before every right row → null
      ("u2", ts(500), "p4")  // other key: only u2 rows visible → r3
    ).toDF("k", "t", "pid")
    val right = Seq(
      ("u1", ts(50), "r1", 1L),
      ("u1", ts(90), "r2", 2L),
      ("u2", ts(400), "r3", 3L),
      ("u1", ts(480), "r4", 4L) // u1-only: must never leak to u2's p4
    ).toDF("k", "t", "rid", "v")

    val out = AsOf.asofBackward(left, right, Seq("k"), "t", "t",
      Seq("rid" -> "rid", "v" -> "rv"))
      .select("pid", "rid", "rv")
      .as[(String, Option[String], Option[Long])].collect()
      .map { case (p, r, v) => p -> (r, v) }.toMap

    assert(out == Map(
      "p1" -> (Some("r2"), Some(2L)),
      "p2" -> (Some("r1"), Some(1L)),
      "p3" -> (None, None),
      "p4" -> (Some("r3"), Some(3L))))
  }
}
