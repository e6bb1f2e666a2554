package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("media frame: binary payload + typed metadata schema") {
    val mf = Multimodal.mediaFrame(spark, dir)
    val schema = mf.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height"))
    val row = mf.filter(col("media_id") === 3).collect().head
    val m = row.getStruct(row.fieldIndex("meta"))
    assert(Set("png", "jpeg", "wav").contains(m.getString(0)))
    assert(m.getInt(1) > 0 && m.getInt(2) > 0)
  }

  test("feature extraction: batched executor-side decode, deterministic") {
    val mf = Multimodal.mediaFrame(spark, dir).repartition(3)
    val feats = Multimodal.extractFeatures(mf)
    assert(feats.rdd.getNumPartitions == 3,
      "mapPartitions must preserve partitioning (no shuffle)")
    val rows = feats.collect()
    assert(rows.length == mf.count())
    val again = Multimodal.extractFeatures(mf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(again(r.getLong(0)) == r.getLong(2), "checksum deterministic")
      val f = r.getSeq[Float](3)
      assert(f.length == 8)
      assert(math.abs(f.sum - 1f) < 1e-3, "histogram features normalized")
    }
  }

  test("frame sampling indexes align with payload size") {
    val out = graft.SparkEntry.queries("q51_frame_sample")(spark, dir)
    val mf = Multimodal.mediaFrame(spark, dir)
      .select(col("media_id"),
        length(col("payload")).cast("long").as("len"))
    val joined = out.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("maxf"))
      .join(mf, "media_id")
      .collect()
    joined.foreach { r =>
      val frames = (r.getAs[Long]("len") + 255) / 256
      val expected = (0L until frames by 4).size
      assert(r.getAs[Long]("n") == expected)
      assert(r.getAs[Long]("maxf") < frames)
    }
  }
}
