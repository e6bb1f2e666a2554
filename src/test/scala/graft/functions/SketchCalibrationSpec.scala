package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two round-8 digest-derived sketches pinned against brute-force
  * recomputes of their own definitions — register/slot VALUES, not just
  * estimates, since cross-engine bit-identity is their design contract
  * (the q130/q134 oracles replay the identical md5 arithmetic). */
class SketchCalibrationSpec extends SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("HLL registers equal the brute-force register file; merge is max") {
    val items = (0 until 5000).map(i => s"tok$i") ++
      (0 until 5000).map(i => s"tok$i") // duplicates must not move registers
    // 8 partitions force real partial/merge paths
    val df = items.toDF("t").repartition(8)
    val regs = df.agg(HllAgg.registers(col("t")).as("r"))
      .collect()(0).getSeq[Int](0)

    val expected = new Array[Int](256)
    items.distinct.foreach { t =>
      val hex = md5hex(t)
      val reg = Integer.parseInt(hex.substring(0, 2), 16)
      val tail = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      val rho = if (tail == 0L) 33 else 33 - (64 - java.lang.Long.numberOfLeadingZeros(tail))
      if (rho > expected(reg)) expected(reg) = rho
    }
    assert(regs == expected.toSeq)

    // estimate lands inside ~3σ of truth (σ ≈ 1.04/√256 ≈ 6.5%)
    val harm = regs.map(r => 1.0 / (1L << r)).sum
    val est = (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 / harm
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"est=$est")
  }

  test("md5-minhash signature equals per-slot brute-force minima and " +
      "estimates Jaccard within binomial error") {
    val featsA = (0 until 400).map(i => s"f$i")
    val featsB = (100 until 500).map(i => s"f$i") // true J = 300/500 = 0.6
    def sig(fs: Seq[String]): Seq[Long] = {
      val buf = Array.fill(64)(Long.MaxValue)
      fs.foreach { f =>
        (0 until 16).foreach { j =>
          val hex = md5hex(s"$j|$f")
          (0 until 4).foreach { r =>
            val h = java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16)
            if (h < buf(j * 4 + r)) buf(j * 4 + r) = h
          }
        }
      }
      buf.toSeq
    }
    val df = (featsA.map(("a", _)) ++ featsB.map(("b", _))).toDF("id", "f")
      .repartition(8)
    val got = df.groupBy("id").agg(Md5MinHashAgg.signature(col("f")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == sig(featsA))
    assert(got("b") == sig(featsB))

    val estJ = got("a").zip(got("b")).count { case (x, y) => x == y } / 64.0
    // σ = √(0.6·0.4/64) ≈ 0.061 — allow 3σ
    assert(math.abs(estJ - 0.6) < 0.19, s"estJ=$estJ")
  }
}
