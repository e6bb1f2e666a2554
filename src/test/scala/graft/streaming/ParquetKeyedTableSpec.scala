package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSuite

class ParquetKeyedTableSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("key", StringType), StructField("v", IntegerType)))

  test("bucketed layout: merge, delete, lookup prune to one bucket") {
    val t = new ParquetKeyedTable(spark, tmpDir("bucketed"), numBuckets = 4)
    t.merge(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("key", "v"),
      Seq.empty[String].toDF("key"))
    assert(t.snapshot(schema).as[(String, Int)].collect().toSet ==
      Set(("a", 1), ("b", 2), ("c", 3)))

    t.merge(Seq(("a", 9)).toDF("key", "v"), Seq("b").toDF("key"))
    assert(t.snapshot(schema).as[(String, Int)].collect().toSet ==
      Set(("a", 9), ("c", 3)))

    val hit = t.lookup(schema, "a")
    assert(hit.as[(String, Int)].collect().toSeq == Seq(("a", 9)))
    // pruning is visible in the plan: only the key's bucket is scanned
    val scan = hit.queryExecution.executedPlan.toString
    assert(scan.contains("bucket"), s"expected bucket pruning in:\n$scan")

    t.delete(Seq("a").toDF("key"))
    assert(t.snapshot(schema).as[(String, Int)].collect().toSet ==
      Set(("c", 3)))
  }

  test("unbucketed layout still round-trips (default)") {
    val t = new ParquetKeyedTable(spark, tmpDir("flat"))
    t.merge(Seq(("x", 1)).toDF("key", "v"), Seq.empty[String].toDF("key"))
    t.merge(Seq(("x", 2), ("y", 5)).toDF("key", "v"),
      Seq.empty[String].toDF("key"))
    assert(t.snapshot(schema).as[(String, Int)].collect().toSet ==
      Set(("x", 2), ("y", 5)))
  }
}
