package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (small core count + few shuffle
  * partitions: these tests verify SEMANTICS; scale posture is exercised by
  * the sf0.1 bench). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuite.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // Same per-scope release discipline as Bench/Verify: suites share one
  // JVM-wide session, so query-builder persists would otherwise
  // accumulate across all 36 suites (r4 VERDICT #1).
  override protected def afterAll(): Unit = {
    CacheScope.drainWithCheckpoints(spark)
    super.afterAll()
  }
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-test-ckpt").toString)
    s
  }
}
