package graft

/** Textual Flink-SQL → Spark-SQL shims for the few reference constructs
  * Spark's parser/analyzer rejects verbatim — what makes
  * `/root/reference/flink-ddl.sql` runnable TOP-TO-BOTTOM through
  * [[Engine.sqlScript]] (its DDL dialect is already handled by [[Ddl]];
  * these cover the DML bodies).
  *
  *  - **Salt elision** (`flink-ddl.sql:209,225,257`): the reference's
  *    inner aggregations group by
  *    `mod(hash_code(FLOOR(RAND(n)*1000)), m)` — a manual two-level
  *    aggregation salt spreading hot keys over reducers. Spark rejects
  *    nondeterministic grouping expressions outright (`rand` may not
  *    appear in GROUP BY), and the idiom is RESULT-INVISIBLE by
  *    construction: the outer query re-aggregates over the remaining
  *    keys, so summing finer (salted) partials equals summing the
  *    unsalted groups (SURVEY §4 — F4–F7 n/a by design; AQE's runtime
  *    skew handling replaces the manual salt on the Spark side). The
  *    term is removed together with one adjacent comma, leaving the
  *    surrounding GROUP BY intact wherever the salt sits in the list.
  *  - **`COLLECT(ROW(...))` → `collect_list(struct(...))`**
  *    (`flink-ddl.sql:130`): Flink's multiset-of-rows aggregate under
  *    its Spark name. Multiset multiplicity is preserved (collect_list
  *    keeps duplicates); only the unordered-vs-list distinction differs,
  *    which no reference consumer observes.
  *
  * `LISTAGG(x, ',')` needs no shim — Spark 4 ships `listagg`.
  * Rewrites are regex-anchored to the exact idioms (function names with
  * arbitrary spacing); statements not using them pass through verbatim.
  */
object FlinkDialect {

  private val salt =
    """mod\s*\(\s*hash_code\s*\(\s*floor\s*\(\s*rand\s*\(\s*\d+\s*\)\s*\*\s*\d+\s*\)\s*\)\s*,\s*\d+\s*\)"""

  // the salt term plus ONE adjacent comma: ", salt" (mid/trailing list
  // position) first, then "salt ," (leading position)
  private val SaltAfterComma = s"(?i),\\s*$salt".r
  private val SaltBeforeComma = s"(?i)$salt\\s*,".r

  private val CollectRow = """(?i)\bCOLLECT\s*\(\s*ROW\s*\(""".r

  def normalize(stmt: String): String = {
    val noSalt = SaltBeforeComma.replaceAllIn(
      SaltAfterComma.replaceAllIn(stmt, ""), "")
    CollectRow.replaceAllIn(noSalt, "collect_list(struct(")
  }
}
