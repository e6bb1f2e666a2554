package graft

/** Layout-invariance: every query that claims determinism must return the
  * IDENTICAL row set when the physical layout changes — different scan
  * split sizes (stand-in for a different executor count / file layout)
  * and a different shuffle width. This is what "reshuffle-stable" and
  * "replays pack identically" mean operationally on a cluster whose
  * partitioning the user does not control: a query whose answer depends
  * on partition boundaries (rand(), first() without order, accumulation
  * order reaching the output) fails here even though the single-layout
  * oracle gate cannot see it. */
class PartitioningInvarianceSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  // determinism-claiming queries across the families: content-hash split
  // and sampling, sequence packing, sessionization windows, LSH pair
  // generation, curriculum bins, cohort full-outer, salted join
  // q138 rides on the decimal entropy ledger: Σ c·ln c is summed as
  // DECIMAL(28,12) of 12-rounded terms, so re-layout (which re-orders
  // the partial sums) must not move a single bit of entropy_bits
  // q158/q159/q160 are window-ordered (SCD2 versions, sorted-neighborhood
  // candidates, as-of carry-forward): their tie-breaks claim full
  // determinism, so re-layout must not move a version number or a pair
  private val names = Seq("q34_train_split", "q35_stratified_sample",
    "q63_seq_pack", "q69_sessionize", "q21_minhash_lsh",
    "q66_curriculum_bins", "q77_churn_cohorts", "q64_salted_join",
    "q138_char_entropy", "q158_scd2_history", "q159_entity_match",
    "q160_temporal_join",
    // q161 rides the drift decimal ledger (q138's re-layout contract);
    // q163's diff classes and q164's Wilson bounds are pure per-group
    // IEEE arithmetic that must not move with reducer assignment
    "q161_drift_psi", "q163_snapshot_diff", "q164_gate_ci",
    // q167 ranks over ROUND-6 scores precisely so summation order
    // cannot flip a rank under re-layout — that claim is load-bearing;
    // q168's kappa and q169's boundary rule are per-row/per-group exact
    "q167_hybrid_rrf", "q168_gate_kappa", "q169_cdc_chunking",
    // q170's candidate windows order by (text, doc_id) — the id
    // tie-break is what keeps equal-text runs re-layout-stable
    "q170_blocking_audit")

  // q21's production form reads the session-memoized parquet pair table,
  // which would make re-layout runs trivially identical — invariance must
  // exercise the LIVE ladder (explode → MinHash → band → verify) instead
  private val liveQ21: (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame = { (s, d) =>
    import org.apache.spark.sql.functions._
    val exploded = graft.sources.Tables.load(s, d, "documents")
      .select(col("doc_id"),
        explode(graft.operators.Dedup.shingles(col("text"))).as("f"))
    graft.operators.Dedup.nearDupPairs(exploded, 0.8, bandRows = 2,
      nBands = 32)
  }

  private def rowSet(name: String): Set[String] = {
    val build =
      if (name == "q21_minhash_lsh") liveQ21 else SparkEntry.queries(name)
    build(spark, dir).collect().map(_.toString).toSet
  }

  test("row sets are identical under different scan splits and shuffle width") {
    val conf = spark.conf
    val baseline = names.map(n => n -> rowSet(n)).toMap
    val origBytes = conf.get("spark.sql.files.maxPartitionBytes")
    val origShuffle = conf.get("spark.sql.shuffle.partitions")
    try {
      // tiny splits: every parquet fractures into many input partitions;
      // shuffle width changes reducer assignment of every key
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      conf.set("spark.sql.shuffle.partitions", "7")
      for (n <- names) {
        val relaid = rowSet(n)
        assert(relaid == baseline(n), {
          val miss = baseline(n) -- relaid
          val extra = relaid -- baseline(n)
          s"$n drifted under re-layout: ${miss.size} missing " +
            s"(e.g. ${miss.take(2)}), ${extra.size} extra (e.g. ${extra.take(2)})"
        })
      }
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", origBytes)
      conf.set("spark.sql.shuffle.partitions", origShuffle)
    }
  }
}
