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

  test("header decode recovers the declared metadata FROM THE BYTES") {
    val mf = Multimodal.mediaFrame(spark, dir)
    val feats = Multimodal.extractFeatures(mf)
      .select("media_id", "format", "width", "height", "sample_rate")
    // parsed format/dims must equal the declared meta for images; wav
    // recovers the embedded sample rate
    val bad = mf.select(col("media_id"), col("meta.format").as("dfmt"),
      col("meta.width").as("dw"), col("meta.height").as("dh"))
      .join(feats, "media_id")
      .filter(col("format") =!= col("dfmt") ||
        (col("dfmt").isin("png", "jpeg") &&
          (col("width") =!= col("dw") || col("height") =!= col("dh"))) ||
        (col("dfmt") === "wav" &&
          col("sample_rate") =!=
            (pmod(col("media_id"), lit(8)) * 4000 + 8000).cast("int")))
    assert(bad.isEmpty, s"byte parse must invert byte construction: " +
      bad.limit(3).collect().mkString(", "))
  }

  test("feature extraction: batched executor-side decode, deterministic") {
    val mf = Multimodal.mediaFrame(spark, dir).repartition(3)
    val feats = Multimodal.extractFeatures(mf)
    assert(feats.rdd.getNumPartitions == 3,
      "mapPartitions must preserve partitioning (no shuffle)")
    val rows = feats.collect()
    assert(rows.length == mf.count())
    val again = Multimodal.extractFeatures(mf).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("checksum")).toMap
    rows.foreach { r =>
      assert(again(r.getAs[Long]("media_id")) == r.getAs[Long]("checksum"),
        "checksum deterministic")
      val f = r.getSeq[Float](r.fieldIndex("feature"))
      assert(f.length == 8)
      assert(math.abs(f.sum - 1f) < 1e-3, "histogram features normalized")
    }
  }

  test("decodeHeader walks real chunk/marker layouts, not fixed offsets") {
    // PNG with a chunk BEFORE IHDR would be invalid, but JPEG with an
    // APP0 segment before SOF0 is the normal real-world layout — the
    // marker scan must find SOF0 wherever it is
    val w = 640
    val h = 480
    val app0 = Array[Byte](0xFF.toByte, 0xD8.toByte, // SOI
      0xFF.toByte, 0xE0.toByte, 0x00, 0x10) ++ // APP0, len 16
      ("JFIF".getBytes ++ Array.fill[Byte](10)(0)) ++ // 14 data bytes
      Array[Byte](0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08, // SOF0
        (h >> 8).toByte, (h & 0xff).toByte,
        (w >> 8).toByte, (w & 0xff).toByte, 0x03)
    val hdr = Multimodal.decodeHeader(app0)
    assert(hdr.format == "jpeg" && hdr.width == w && hdr.height == h)

    // unknown bytes degrade gracefully
    assert(Multimodal.decodeHeader("plain text".getBytes).format == "unknown")
  }

  test("frame sampling indexes align with document size") {
    val out = graft.SparkEntry.queries("q51_frame_sample")(spark, dir)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        octet_length(col("text").cast("binary")).cast("long").as("len"))
    val joined = out.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("maxf"))
      .join(docs, "media_id")
      .collect()
    joined.foreach { r =>
      val frames = (r.getAs[Long]("len") + 255) / 256
      val expected = (0L until frames by 4).size
      assert(r.getAs[Long]("n") == expected)
      assert(r.getAs[Long]("maxf") < frames)
    }
  }

  test("blockMeanHash: exact integer block-mean bits, hand-checked") {
    // constant bytes: no block's mean strictly exceeds the global mean
    assert(Multimodal.blockMeanHash(Array.fill[Byte](64)(7), 0, 64) == 0L)
    // first half 0, second half 100: blocks 16..31 above the mean
    val half = (Array.fill[Byte](32)(0) ++ Array.fill[Byte](32)(100))
    assert(Multimodal.blockMeanHash(half, 0, 64) == 0xFFFF0000L)
    // header offset shifts the window: same data section, same hash
    val shifted = Array.fill[Byte](10)(55) ++ half
    assert(Multimodal.blockMeanHash(shifted, 10, 64) == 0xFFFF0000L)
  }

  test("q125 phash pairs equal an exhaustive hamming join; hashes come " +
      "from the PARSED data section") {
    val hashes = Multimodal.perceptualHashes(Multimodal.mediaFrame(spark, dir))
      .filter(col("data_len") >= 32)
      .select("media_id", "phash").as[(Long, Long)].collect()
    // the engine's hash must equal a direct hash of the TEXT bytes —
    // the data section is the text, so a wrong dataOffset shows up here
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    hashes.foreach { case (id, h) =>
      val b = texts(id).getBytes("UTF-8")
      assert(h == Multimodal.blockMeanHash(b, 0, b.length),
        s"media $id: hash over parsed payload != hash over text bytes")
    }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes; if a < b
      d = java.lang.Long.bitCount(ha ^ hb); if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = graft.SparkEntry.queries("q125_phash_neardup")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute,
      "banded candidates must reproduce the exhaustive hamming-<=3 join")
  }

  test("q154 == in-memory min-label components + max-pixels survivor " +
      "over the exhaustive hamming graph") {
    val hashes = Multimodal.perceptualHashes(Multimodal.mediaFrame(spark, dir))
      .filter(col("data_len") >= 32)
      .select("media_id", "phash").as[(Long, Long)].collect()
    val pairs = for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)
    // min-label propagation to fixpoint (the star contraction's output
    // labeling and the oracle's min(v) agree with this by q36's pin)
    val label = scala.collection.mutable.Map.empty[Long, Long]
    pairs.foreach { case (a, b) =>
      label.getOrElseUpdate(a, a); label.getOrElseUpdate(b, b)
    }
    var changed = true
    while (changed) {
      changed = false
      pairs.foreach { case (a, b) =>
        val m = math.min(label(a), label(b))
        if (label(a) != m) { label(a) = m; changed = true }
        if (label(b) != m) { label(b) = m; changed = true }
      }
    }
    def px(id: Long): Long =
      if (id % 3 < 2) ((id % 64) * 16 + 16) * ((id % 48) * 16 + 16) else 0L
    val expected = label.toSeq.groupBy(_._2).map { case (cid, ms) =>
      val members = ms.map(_._1)
      val surv = members.maxBy(id => (px(id), -id))
      (cid, members.size.toLong, surv, px(surv))
    }.toSet
    val got = graft.SparkEntry
      .queries("q154_media_dedup_clusters")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "the corpus must plant at least one cluster")
    // the rule is real: the survivor is never beaten on (pixels, -id)
    got.foreach { case (cid, _, surv, spx) =>
      label.filter(_._2 == cid).keys.foreach { m =>
        assert(px(m) < spx || (px(m) == spx && m >= surv),
          s"cluster $cid: member $m beats survivor $surv")
      }
    }
  }
}
