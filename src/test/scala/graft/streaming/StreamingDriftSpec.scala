package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.types._

import graft.{SparkSuite, TableSpec}

/** Streaming drift monitor == batch q161 arithmetic over the current
  * event state at every step of a replayed changelog: per-(day, type)
  * counts maintained ±, PSI priced at read via the shared
  * psiFromCounts, a type-move shifting BOTH days' shares, an emptied
  * stratum leaving the sink (and its day pair losing the category),
  * replay idempotent. */
class StreamingDriftSpec extends SparkSuite {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", StringType), StructField("ts", LongType),
    StructField("event_type", StringType)))
  private val sources =
    Seq(TableSpec("events", evSchema, primaryKey = Seq("event_id")))

  private val DayNs = 86400L * 1000000000L
  private def at(day: Int, k: Int): Long = day * DayNs + k * 1000000000L

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("events", env, seqNo)
  }
  private def img(id: String, ts: Long, typ: String) =
    s"""{"event_id":"$id","ts":$ts,"event_type":"$typ"}"""
  private def create(id: String, ts: Long, typ: String) =
    rec(s"""{"before":null,"after":${img(id, ts, typ)},"op":"c","ts_ms":$seqNo}""")
  private def retype(id: String, ts: Long, o: String, n: String) =
    rec(s"""{"before":${img(id, ts, o)},"after":${img(id, ts, n)},"op":"u","ts_ms":$seqNo}""")
  private def delete(id: String, ts: Long, typ: String) =
    rec(s"""{"before":${img(id, ts, typ)},"after":null,"op":"d","ts_ms":$seqNo}""")

  /** q161's arithmetic, independently: counts per (day, type), shares,
    * term = round12((p−q)·ln(p/q)) summed exactly, psi = round6. */
  private def expectedPsi(state: Seq[(Long, String)]): Map[(String, String), (Long, Double, Boolean)] = {
    def dayStr(d: Long): String = LocalDate.ofEpochDay(d).toString
    val counts = state.groupBy { case (ts, typ) => (ts / DayNs, typ) }
      .view.mapValues(_.size.toLong).toMap
    val totals = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val days = totals.keys.toSeq.sorted
    (for {
      d <- days if totals.contains(d + 1)
      common = counts.keys.filter(_._1 == d).map(_._2)
        .filter(t => counts.contains((d + 1, t))).toSeq
      if common.nonEmpty
    } yield {
      val sl = common.map { typ =>
        val p = counts((d, typ)).toDouble / totals(d)
        val q = counts((d + 1, typ)).toDouble / totals(d + 1)
        BigDecimal(((p - q) * math.log(p / q)).toString)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val psi = BigDecimal(sl.toDouble.toString)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (dayStr(d), dayStr(d + 1)) ->
        (common.size.toLong, psi, psi >= graft.operators.Governance.DriftThreshold)
    }).toMap
  }

  private def readPsi(sink: InMemoryUpsertSink): Map[(String, String), (Long, Double, Boolean)] = {
    val docs = sink.docs("event_drift").values.toSeq
    if (docs.isEmpty) return Map.empty
    val strata = docs.map(d => (d("day").toString,
      d("event_type").toString, d("c").asInstanceOf[Long]))
      .toDF("day", "event_type", "c")
    StreamingDrift.psi(strata)
      .as[(String, String, Long, Double, Boolean)].collect()
      .map { case (a, b, n, psi, dr) => (a, b) -> (n, psi, dr) }.toMap
  }

  test("incremental drift strata + read-time PSI == batch arithmetic") {
    val sink = new InMemoryUpsertSink
    val stateDir = tmpDir("sdrift")
    val pipeline = new CdcPipeline(spark, sources, stateDir, sink,
      Seq(StreamingDrift.eventTypeCounts(spark, stateDir)))

    var state = Map.empty[String, (Long, String)]
    def step(batchId: Long, recs: (String, String, Long)*): Unit = {
      pipeline.processBatch(recs.toDF("table", "value", "seq"),
        Some(batchId))
      assert(readPsi(sink) == expectedPsi(state.values.toSeq),
        s"batch $batchId")
    }

    // day 0: 3 click + 1 view; day 1: 1 click + 3 view → a real shift
    val b0 = Seq(
      "a1" -> (at(0, 1), "click"), "a2" -> (at(0, 2), "click"),
      "a3" -> (at(0, 3), "click"), "a4" -> (at(0, 4), "view"),
      "b1" -> (at(1, 1), "click"), "b2" -> (at(1, 2), "view"),
      "b3" -> (at(1, 3), "view"), "b4" -> (at(1, 4), "view"))
    state = b0.toMap
    step(0, b0.map { case (id, (ts, ty)) => create(id, ts, ty) }: _*)
    val first = readPsi(sink)
    assert(first.keySet == Set(("1970-01-01", "1970-01-02")))
    assert(first.head._2._3, "3:1 → 1:3 flip must read drifted")

    // a type move on day 1 narrows the gap from BOTH sides of the pair
    state += ("b2" -> (at(1, 2), "click"))
    step(1, retype("b2", at(1, 2), "view", "click"))

    // day 2 appears (new pair); deleting day 0's only view empties that
    // stratum — the (day0, day1) pair loses the category entirely
    state += ("c1" -> (at(2, 1), "click")); state -= "a4"
    step(2, create("c1", at(2, 1), "click"),
      delete("a4", at(0, 4), "view"))
    assert(readPsi(sink).keys.toSet ==
      Set(("1970-01-01", "1970-01-02"), ("1970-01-02", "1970-01-03")))

    // replay idempotence
    pipeline.processBatch(
      Seq(create("c1", at(2, 1), "click"),
        delete("a4", at(0, 4), "view")).toDF("table", "value", "seq"),
      Some(2L))
    assert(readPsi(sink) == expectedPsi(state.values.toSeq))
  }
}
