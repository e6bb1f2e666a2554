package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Changelog-materialization semantics (SURVEY §5 strategies 2 and 5):
  * scripted c/u/u/d sequences per key, then a scalacheck property pinning
  * incremental maintenance ≡ batch compaction on random op sequences. */
class MaterializerSpec extends SparkSuite {
  import spark.implicits._

  private val rowType = StructType(Seq(
    StructField("id", StringType), StructField("v", IntegerType)))
  private val logType = StructType(Seq(
    StructField("key", StringType), StructField("op", StringType),
    StructField("before", rowType), StructField("after", rowType),
    StructField("ts_ms", LongType), StructField("seq", LongType)))

  /** (key, op, value, ts, seq) → normalized changelog frame */
  private def changelog(events: Seq[(String, String, Int, Long, Long)]) = {
    val rows = events.map { case (k, op, v, ts, seq) =>
      val img = org.apache.spark.sql.Row(k, v)
      org.apache.spark.sql.Row(
        k, op,
        if (op == "c") null else img,
        if (op == "d") null else img,
        ts, seq)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), logType)
  }

  test("c/u/u keeps the latest image; d removes the key") {
    val log = changelog(Seq(
      ("a", "c", 1, 100L, 0L),
      ("a", "u", 2, 200L, 1L),
      ("a", "u", 3, 300L, 2L),
      ("b", "c", 7, 100L, 3L),
      ("b", "d", 7, 400L, 4L),
      ("c", "c", 9, 500L, 5L)))
    val out = Materializer.latestRows(log)
      .select("id", "v").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 3, "c" -> 9))
  }

  test("equal ts_ms resolved by seq (kafka-offset order)") {
    val log = changelog(Seq(
      ("a", "c", 1, 100L, 0L),
      ("a", "u", 5, 100L, 2L),
      ("a", "u", 4, 100L, 1L)))
    val out = Materializer.latestRows(log).select("v").as[Int].collect()
    assert(out.toSeq == Seq(5))
  }

  test("compact keeps delete tombstones for downstream state merge") {
    val log = changelog(Seq(("a", "c", 1, 100L, 0L), ("a", "d", 1, 200L, 1L)))
    val ops = Materializer.compact(log).select("op").as[String].collect()
    assert(ops.toSeq == Seq("d"))
    assert(Materializer.latestRows(log).count() == 0)
  }

  /** Property (SURVEY §5.5): splitting a random op sequence at any point
    * and materializing incrementally (compact prefix, merge suffix) equals
    * compacting the whole log at once. */
  test("incremental compaction ≡ whole-log compaction (scalacheck)") {
    val genEvent = for {
      key <- Gen.oneOf("k1", "k2", "k3")
      op <- Gen.oneOf("c", "u", "d")
      v <- Gen.choose(0, 99)
      ts <- Gen.choose(0L, 5L)
    } yield (key, op, v, ts, 0L)

    val gen = Gen.nonEmptyListOf(genEvent)
    var seed = Seed(42L)
    (1 to 20).foreach { trial =>
      val raw = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      // assign global seq = arrival order (what kafka offsets give us)
      val events = raw.zipWithIndex.map { case ((k, op, v, ts, _), i) =>
        (k, op, v, ts, i.toLong)
      }
      val whole = Materializer.latestRows(changelog(events))
        .select("key", "v").as[(String, Int)].collect().toSet

      val (first, second) = events.splitAt(events.length / 2)
      val prefix = Materializer.compact(changelog(first))
      val incremental = Materializer.latestRows(
        prefix.unionByName(changelog(second)))
        .select("key", "v").as[(String, Int)].collect().toSet

      assert(incremental == whole, s"trial $trial, events=$events")
    }
  }
}
