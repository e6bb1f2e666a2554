package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Temporal joins — as-of (backward) and interval — two §2.4 extension
  * targets the reference has no analog for, re-expressed the way Spark
  * wants them at scale:
  *
  *  - As-of is NOT a per-row "latest earlier row" subquery (O(n) probes)
  *    and NOT a range cross-join. It is union-tag → one shuffle on the
  *    key → per-key time sort → `last(_, ignoreNulls)` carry-forward
  *    window → keep left rows. One shuffle + one sort, the same cost
  *    shape as any keyed window — at 100 TB the work is
  *    sort-within-partition, never probe-per-row.
  *  - Interval join stays a plain equi join on the key with the time
  *    band as a post-join filter: Catalyst plans the equi side (shuffle
  *    or broadcast) and the band prunes matches inside each key group.
  */
object AsOf {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Backward as-of join: for every `left` row, attach `payload`
    * columns of the `right` row with the greatest `rightTs` ≤ that
    * row's `leftTs` within the same `keys` group (left-outer: nulls
    * when no such row). Payload columns must be non-null in `right` —
    * each is carried forward independently, so they only stay mutually
    * consistent when every right row fills all of them.
    *
    * Tie rule: a right row AT the left row's timestamp matches
    * (`≤`, not `<`) — right rows sort before left rows at equal ts.
    * `tieBreak` (names from `payload`'s OUTPUT side) deterministically
    * orders right rows that share (key, ts): the greatest tie-break
    * tuple wins (last write by that order). Without it, same-ts right
    * duplicates resolve by physical order — fine when (key, ts) is
    * unique, nondeterministic on a cluster when it is not. */
  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[(String, String)],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val outNames = payload.map(_._2)
    val rightTypes = payload.map { case (src, _) =>
      right.schema(src).dataType }

    val lTagged = left
      .select(leftCols.map(col) ++
        outNames.zip(rightTypes).map { case (n, dt) =>
          lit(null).cast(dt).as(n) } ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_side")): _*)
    val rTagged = right
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map { case (src, n) => col(src).as(n) } ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_side")): _*)
      .select(lTagged.columns.map(col): _*) // align column order

    // tie-break keys only discriminate among right rows (_side groups
    // first, and left rows carry null payloads — tied among themselves,
    // which is harmless: they only read)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts") +: col("_side") +: tieBreak.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    outNames
      .foldLeft(lTagged.unionByName(rTagged)) { (df, n) =>
        df.withColumn(n, last(col(n), ignoreNulls = true).over(w))
      }
      .filter(col("_side") === 1)
      .select((leftCols ++ outNames).map(col): _*)
  }

  val queries: Seq[QueryDef] = Seq(

    /** Each purchase with the same user's most recent prior-or-equal
      * click — attribution, the canonical as-of use. The DuckDB oracle
      * uses its native ASOF LEFT JOIN, so the gate pins our
      * carry-forward window form against an independent first-class
      * implementation of the semantics. */
    QueryDef("q45_asof_join",
      "SELECT p.event_id, p.user_id, p.ts, " +
        "c.event_id AS click_id, c.ts AS click_ts, " +
        "epoch_us(p.ts) - epoch_us(c.ts) AS gap_us " +
        "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND c.ts <= p.ts") { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      asofBackward(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("event_id" -> "click_id", "ts" -> "click_ts"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("click_id"), col("click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts")))
            .as("gap_us"))
    },

    /** Interval join: every click in the hour before each purchase by
      * the same user — the bounded-window variant attribution needs
      * when ALL touches matter, not just the latest. */
    QueryDef("q46_interval_join",
      "SELECT p.event_id, p.user_id, p.ts, " +
        "c.event_id AS click_id, c.ts AS click_ts " +
        "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p " +
        "JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id " +
        "AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts") { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("click_ts"))
      purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") <= col("ts"))
        .select("event_id", "user_id", "ts", "click_id", "click_ts")
    }
  )
}
