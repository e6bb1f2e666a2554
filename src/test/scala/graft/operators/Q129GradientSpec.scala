package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** r14 q129 optimization guard: [[TextAnalysis.logregGradient]] (the
  * closure-based gradient round that replaced the per-round 65-aggregate
  * DataFrame) must reproduce the aggregate form's decimal sums EXACTLY —
  * the oracle's unrolled per-round CTEs hash-match the resulting scores,
  * so any drift in a single contribution's 12-decimal rounding would show
  * up as a red gate. The reference below IS the former plan (65
  * whole-stage-codegen'd `sum(cast(round(e·xs[i], 12) as decimal(18,12)))`
  * aggregates with the weights inlined as literals), evaluated side by
  * side across all six rounds with the weight vector evolving through the
  * new path. */
class Q129GradientSpec extends SparkSuite {
  test("logregGradient matches the 65-aggregate DataFrame form exactly " +
      "across six evolving rounds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // rows shaped like q129 features: bucket count c ∈ [0,50] over a doc
    // of n ∈ [40,3000] tokens → x = c·16/n, bias 1.0 appended (the same
    // value distribution the real feature table produces)
    val rows = (1 to 4000).map { _ =>
      val n = 40 + rnd.nextInt(2961)
      val xs = (Array.tabulate(64)(_ =>
        rnd.nextInt(51).toDouble * 16 / n) :+ 1.0).toSeq
      val y = if (rnd.nextBoolean()) 1.0 else 0.0
      (y, xs)
    }
    val df = rows.toDF("y", "xs").persist()
    df.count()
    val nDocs = rows.size.toLong
    def r6(x: java.math.BigDecimal): java.math.BigDecimal =
      x.setScale(6, java.math.RoundingMode.HALF_UP)
    def sigmoid(z: org.apache.spark.sql.Column) =
      lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

    val featRows = df.select(col("y"), col("xs")).queryExecution.toRdd
    var w: IndexedSeq[java.math.BigDecimal] =
      IndexedSeq.fill(65)(java.math.BigDecimal.ZERO)
    for (round_ <- 1 to 6) {
      // reference: the former per-round plan, weights as literals
      val p = sigmoid(graft.functions.DotProduct(
        col("xs"), typedlit(w.map(_.doubleValue))))
      val err = df.select((p - col("y")).as("e"), col("xs"))
      val aggs = (0 until 65).map(i =>
        sum(round(col("e") * element_at(col("xs"), i + 1), 12)
          .cast("decimal(18,12)")).as(s"s$i"))
      val ref = err.agg(aggs.head, aggs.tail: _*).head()

      val g = TextAnalysis.logregGradient(featRows, w.map(_.doubleValue).toArray)
      (0 until 65).foreach { i =>
        val refDec = ref.getDecimal(i)
        assert(refDec != null && g(i).compareTo(refDec) == 0,
          s"round $round_ bucket $i: closure ${g(i)} != aggregate $refDec")
        // the double the old plan's trailing cast+divide produced
        assert(refDec.doubleValue() / nDocs.toDouble ==
          g(i).doubleValue() / nDocs.toDouble)
      }
      // evolve the weights through the NEW path (as q129 now does)
      w = w.indices.map { i =>
        r6(new java.math.BigDecimal(
          w(i).doubleValue - 3.0 * (g(i).doubleValue / nDocs.toDouble)))
      }
    }
    df.unpersist()
  }
}
