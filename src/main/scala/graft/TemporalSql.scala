package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** SQL front door for Flink's temporal-table join — the
  * `<probe> JOIN <versioned> FOR SYSTEM_TIME AS OF <probe>.<ts>` surface
  * syntax (the event-time generalization of the reference's lookup-join
  * family, flink-ddl.sql:79-94), compiled onto [[AsOf.asofBackward]]'s
  * one-shuffle carry-forward window — NEVER a per-probe correlated
  * subquery, which is the scale-wrong LATERAL formulation.
  *
  * Supported shape (the form every Flink temporal join in the wild
  * takes — the time attribute lives in FOR SYSTEM_TIME, so ON is pure
  * key equality):
  *
  * {{{
  * SELECT <list>
  * FROM <probeTable> [AS] p
  * [LEFT] JOIN <dimTable> FOR SYSTEM_TIME AS OF p.<tsCol> [AS] d
  * ON p.<k1> = d.<k1'> [AND ...]
  * }}}
  *
  * The dimension's own event-time column comes from its DDL watermark
  * declaration when the spec catalog has one (`WATERMARK FOR c AS ...`
  * is how Flink marks the versioned table's time attribute); otherwise
  * it defaults to the probe's ts column name. INNER drops probes with
  * no valid version at their time; LEFT keeps them with nulls — both
  * via one sentinel payload column, so the join stays a single window
  * pass.
  */
object TemporalSql {

  private val Stmt =
    ("""(?is)^\s*SELECT\s+(.*?)\s+FROM\s+`?([\w.]+)`?\s+(?:AS\s+)?(\w+)\s+""" +
      """(LEFT\s+)?JOIN\s+`?([\w.]+)`?\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+""" +
      """(\w+)\s*\.\s*(\w+)\s+(?:AS\s+)?(\w+)\s+ON\s+(.*?)\s*;?\s*$""").r

  private val Eq = """(?s)^\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*$""".r

  def matches(stmt: String): Boolean = Stmt.findFirstIn(stmt).isDefined

  /** Compile and run a temporal-join statement; None when the statement
    * is not a temporal join (callers fall through to plain Spark SQL). */
  def rewrite(spark: SparkSession, catalog: Engine.Catalog,
      stmt: String): Option[DataFrame] = stmt match {
    case Stmt(sel, probeName, pAlias, leftKw, dimName, ofAlias, tsCol,
        dAlias, onRaw) =>
      require(ofAlias.equalsIgnoreCase(pAlias),
        s"FOR SYSTEM_TIME AS OF must reference the probe alias " +
          s"'$pAlias', got '$ofAlias'")
      val keys = onRaw.split("(?i)\\s+AND\\s+").toSeq.map {
        case Eq(a1, c1, a2, c2) =>
          if (a1.equalsIgnoreCase(pAlias) && a2.equalsIgnoreCase(dAlias))
            c1 -> c2
          else if (a1.equalsIgnoreCase(dAlias) && a2.equalsIgnoreCase(pAlias))
            c2 -> c1
          else throw new IllegalArgumentException(
            s"temporal join ON must equate probe and dimension columns: " +
              s"$a1.$c1 = $a2.$c2")
        case other => throw new IllegalArgumentException(
          "temporal join supports key-equality conjunctions in ON " +
            s"(the time attribute lives in FOR SYSTEM_TIME), got: $other")
      }

      val probe = spark.table(probeName.split('.').last)
      val dim0 = spark.table(dimName.split('.').last)
      // the versioned table's time attribute: its DDL watermark column
      // (Flink's marker for a versioned table's event time), else the
      // probe's ts name
      val dimTs = catalog.get(dimName.split('.').last)
        .flatMap(_.options.keys.find(_.startsWith("watermark."))
          .map(_.stripPrefix("watermark.")))
        .getOrElse(tsCol)

      // align dim key names onto the probe's (asofBackward shuffles both
      // sides on ONE shared key list)
      val dim = keys.foldLeft(dim0) { case (df, (pc, dc)) =>
        if (dc != pc) df.withColumnRenamed(dc, pc) else df
      }
      val keyNames = keys.map(_._1)

      // every non-key dim column rides as payload under an
      // alias-qualified physical name; a sentinel marks matched probes
      // (non-null dim ts carried forward) so INNER can filter without a
      // second pass
      val sentinel = s"__${dAlias}_matched"
      val payload = dim.columns.toSeq.filterNot(keyNames.contains)
        .map(c => c -> s"${dAlias}__$c") :+ (dimTs -> sentinel)
      payload.map(_._2).foreach { n =>
        require(!probe.columns.contains(n),
          s"probe column '$n' collides with a dimension payload name")
      }

      // same-(key, ts) dim duplicates resolve deterministically: the
      // greatest payload tuple in dim column order wins (last write by
      // that order) — a versioned table is not supposed to hold two
      // versions at one instant, but a cluster re-layout must not be
      // able to flip the answer when one does
      val joined0 = AsOf.asofBackward(probe, dim, keyNames, tsCol, dimTs,
        payload, tieBreak = payload.init.map(_._2))
      val joined =
        (if (leftKw == null) joined0.filter(col(sentinel).isNotNull)
         else joined0).drop(sentinel)

      // expose the alias namespace textually: d.x → d__x, p.x → x
      val selRewritten = sel
        .replaceAll(s"(?i)\\b$dAlias\\s*\\.\\s*(\\w+)", s"${dAlias}__$$1")
        .replaceAll(s"(?i)\\b$pAlias\\s*\\.\\s*(\\w+)", "$1")
      val view = s"graft_temporal_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      joined.createOrReplaceTempView(view)
      try Some(spark.sql(s"SELECT $selRewritten FROM $view"))
      finally () // view stays session-scoped; harmless and debuggable
    case _ => None
  }
}
