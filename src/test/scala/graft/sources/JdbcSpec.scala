package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** JDBC connector path against in-process Derby: dimension read,
  * broadcast lookup join (S3), and the JDBC table catalog (S4). */
class JdbcSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val dir = "/root/testdata/sf0.001"

  private lazy val seeded: Unit = {
    // seed Derby from the parquet dim table through Spark's JDBC writer
    Tables.load(spark, dir, "nation")
      .write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", "NATION").save()
  }

  test("dimension table reads back over JDBC") {
    seeded
    val n = Jdbc.table(spark, url, "NATION")
    assert(n.count() == 25)
    assert(n.columns.map(_.toLowerCase).toSet ==
      Set("n_nationkey", "n_name", "n_regionkey"))
  }

  test("broadcast lookup join over a JDBC dim matches the parquet plan") {
    seeded
    val c = Tables.load(spark, dir, "customer")
    val viaJdbc = Jdbc.lookupJoin(c, spark, url, "NATION",
      col("c_nationkey") === col("N_NATIONKEY"))
      .select(col("c_custkey"), col("N_NAME").as("nation"))
    val viaParquet = c.join(
      broadcast(Tables.load(spark, dir, "nation")),
      col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation"))
    assert(viaJdbc.as[(Long, String)].collect().toSet ==
      viaParquet.as[(Long, String)].collect().toSet)
    // the dim side must be broadcast — no shuffle of the fact side
    val plan = viaJdbc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join, got:\n$plan")
  }

  test("JDBC table catalog resolves external metadata (S4)") {
    seeded
    Jdbc.registerCatalog(spark, "jcat", url)
    val out = spark.sql("SELECT * FROM jcat.APP.NATION")
    assert(out.count() == 25)
  }

  test("snapshot bootstrap emits op:r records the CDC pipeline materializes (S2)") {
    seeded
    import org.apache.spark.sql.types._
    val snap = Jdbc.snapshotCdcInput(spark, url, "NATION", "nation")
    val rows = snap.collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getAs[String]("table") == "nation"))
    assert(rows.forall(_.getAs[String]("value").contains("\"op\":\"r\"")))

    // bootstrap a pipeline's state from the snapshot batch
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    val pipeline = new graft.streaming.CdcPipeline(spark,
      Seq(graft.TableSpec("nation", schema, primaryKey = Seq("n_nationkey"))),
      tmpDir("snap-state"), new graft.streaming.InMemoryUpsertSink, Nil)
    pipeline.processBatch(snap)
    assert(pipeline.state("nation").count() == 25)
  }
}
