package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.TableSpec
import graft.cdc.Fixtures

/** Runnable demo (Test/runMain graft.streaming.DemoReplay): replays the
  * reference's captured golden envelope (an order status flip closed→payed,
  * sample/cdc.orders.change-log-mysql.json:115-150) plus a scripted user
  * through the full continuous pipeline and prints the sink state. */
object DemoReplay {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("graft-demo")
    spark.sparkContext.setLogLevel("WARN")

    val ordersSchema = StructType(Seq(
      StructField("id", StringType), StructField("user_id", StringType),
      StructField("amount", DoubleType), StructField("ctime", TimestampType),
      StructField("utime", TimestampType), StructField("status", StringType),
      StructField("channel", StringType)))
    val usersSchema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("age", IntegerType), StructField("ctime", TimestampType),
      StructField("utime", TimestampType)))

    val sink = new InMemoryUpsertSink
    val stateDir = java.nio.file.Files.createTempDirectory("demo-state").toString
    val pipeline = new CdcPipeline(spark,
      Seq(TableSpec("orders", ordersSchema, primaryKey = Seq("id")),
        TableSpec("users", usersSchema, primaryKey = Seq("id"))),
      stateDir, sink,
      Seq(ReferenceViews.orderView, ReferenceViews.userOrderStats))

    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, Long)]
    val query = pipeline.start(
      stream.toDS().toDF("table", "value", "seq"),
      java.nio.file.Files.createTempDirectory("demo-ckpt").toString)

    val user =
      """{"before":null,"after":{"id":"1","name":"Walter","age":44,
        |"ctime":"2021-01-30T13:00:00Z","utime":"2021-01-30T13:00:00Z"},
        |"op":"c","ts_ms":1612153900000}""".stripMargin.replace("\n", "")
    stream.addData(Seq(
      ("users", user, 1L),
      // the GOLDEN sample envelope, verbatim from the reference capture
      ("orders", Fixtures.mysqlOrdersEnvelope, 2L)))
    query.processAllAvailable()

    println("== order_view ==")
    sink.docs("order_view").foreach { case (id, doc) => println(s"$id -> $doc") }
    println("== user_order_stats_view ==")
    sink.docs("user_order_stats_view").foreach { case (id, doc) => println(s"$id -> $doc") }
    query.stop()
    spark.stop()
  }
}
