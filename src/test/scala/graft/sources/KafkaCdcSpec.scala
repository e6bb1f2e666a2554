package graft.sources

import java.sql.Timestamp

import graft.SparkSuite
import graft.cdc.Fixtures

/** S1 topology mapping: kafka-record shape → CDC input contract. The
  * transformation is pure, so it is verified on kafka-shaped static
  * frames (no broker in this environment; `KafkaCdc.stream` wires the
  * same transformation to the real connector). */
class KafkaCdcSpec extends SparkSuite {
  import spark.implicits._

  test("topic → table mapping, envelope passthrough, offset as seq, proctime") {
    val kafkaShaped = Seq(
      ("shard1.ec.orders", Fixtures.mysqlOrdersEnvelope.getBytes("UTF-8"), 42L),
      ("crawler.crawler.comments", "{}".getBytes("UTF-8"), 7L))
      .toDF("topic", "value", "offset")

    // S7 inspection surface renders dump lines like kafka-dump.sh
    val dump = KafkaCdc.inspect(kafkaShaped)
    assert(dump.exists(_.startsWith("shard1.ec.orders@42:")))

    val out = KafkaCdc.toCdcInput(kafkaShaped).collect()
    val byTable = out.map(r => r.getAs[String]("table") -> r).toMap
    assert(byTable.keySet == Set("orders", "comments"))
    assert(byTable("orders").getAs[Long]("seq") == 42L)
    assert(byTable("orders").getAs[String]("value").contains("\"op\""))
    // F1 PROCTIME(): ingest-time processing-time column
    assert(byTable("orders").getAs[Timestamp]("proc_time") != null)
  }
}
