package graft

import org.apache.spark.sql.types._

/** Flink-style `CREATE TABLE <name> (<columns>) WITH ('k'='v', ...)` DDL —
  * the reference's primary surface: every table in its pipeline is declared
  * exactly this way (reference flink-ddl.sql:1-19 and README.md:133-150).
  * Spark's parser rejects the dialect (connector options as quoted pairs,
  * `PRIMARY KEY ... NOT ENFORCED`, computed `AS PROCTIME()` columns,
  * `ROW<...>` types), so [[Engine.sql]] recognizes the statement here and
  * maps it onto the session catalog — DDL creates METADATA ONLY, no job,
  * matching the reference (README.md:342).
  *
  * The parser is a small scanner, not a grammar: balanced-paren extraction
  * of the column list and options (a regex can't span `ROW<...>` nesting or
  * quoted values), then top-level comma splits that respect `()`, `<>`,
  * quotes and backticks. Anything that doesn't match the shape returns None
  * and falls through to stock `spark.sql`, so Spark's own DDL keeps
  * working.
  */
object Ddl {

  /** One parsed statement: stored schema (computed columns excluded — they
    * are virtual, evaluated at read time like Flink's), primary key from
    * the table constraint or inline `PRIMARY KEY NOT ENFORCED`, computed
    * `name AS expr` columns, and the WITH options verbatim. */
  final case class CreateTable(
      name: String,
      schema: StructType,
      primaryKey: Seq[String],
      computed: Seq[(String, String)],
      options: Map[String, String],
      watermark: Option[(String, String)] = None)

  /** Extractor form so [[Engine.sql]] can pattern-match statements. */
  object CreateTableStmt {
    def unapply(stmt: String): Option[CreateTable] = parseCreateTable(stmt)
  }

  private val Head =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?([\w.]+)`?\s*\(""".r
  private val With = """(?is)^\s*WITH\s*\(""".r
  private val OptionPair = """'([^']*)'\s*=\s*'([^']*)'""".r

  def parseCreateTable(stmt: String): Option[CreateTable] = {
    val head = Head.findFirstMatchIn(stmt).getOrElse(return None)
    val (colSrc, afterCols) = balanced(stmt, head.end - 1).getOrElse(return None)
    val w = With.findFirstMatchIn(afterCols).getOrElse(return None)
    val (optSrc, rest) = balanced(afterCols, w.end - 1).getOrElse(return None)
    if (!rest.matches("""(?s)\s*;?\s*""")) return None

    val options = OptionPair.findAllMatchIn(optSrc)
      .map(m => m.group(1) -> m.group(2)).toMap

    val fields = Vector.newBuilder[StructField]
    val pk = Vector.newBuilder[String]
    val computed = Vector.newBuilder[(String, String)]
    var watermark: Option[(String, String)] = None
    splitTop(colSrc, ',').map(_.trim).filter(_.nonEmpty).foreach { item =>
      item match {
        case PkConstraint(cols) =>
          pk ++= splitTop(cols, ',').map(c => stripTicks(c.trim))
        case WatermarkDecl(colName, expr) =>
          if (watermark.isDefined)
            throw new IllegalArgumentException(
              "multiple WATERMARK declarations in one statement")
          watermark = Some(stripTicks(colName) -> expr.trim)
        case ComputedCol(name, expr) =>
          computed += stripTicks(name) -> expr.trim
        case ColumnDef(name, tpe, inlinePk) =>
          val n = stripTicks(name)
          fields += StructField(n, parseType(tpe))
          if (inlinePk) pk += n
        case other =>
          throw new IllegalArgumentException(
            s"cannot parse column definition: '$other'")
      }
    }
    val schema = StructType(fields.result())
    // a watermark on a nonexistent column is a DDL-time error in Flink;
    // accepting it here would only defer the failure to the first
    // streaming read of the typo'd name. Computed (virtual) columns are
    // valid watermark targets — Flink's own examples declare
    // `ts AS TO_TIMESTAMP(raw), WATERMARK FOR ts AS ...`
    val comp = computed.result()
    watermark.foreach { case (c, _) =>
      val known = schema.fieldNames ++ comp.map(_._1)
      require(known.contains(c),
        s"WATERMARK FOR $c: no such column (have ${known.mkString(", ")})")
    }
    Some(CreateTable(head.group(1), schema,
      pk.result(), comp, options, watermark))
  }

  /** `WATERMARK FOR col AS expr` — standard Flink event-time DDL. The
    * declaration is retained as metadata (Spark declares watermarks on
    * the streaming read, `withWatermark` — see
    * graft.streaming.EventWindows); before this was recognized the
    * clause fell into [[ColumnDef]] and aborted the whole statement. */
  private object WatermarkDecl {
    private val R = """(?is)^WATERMARK\s+FOR\s+(`[^`]+`|\w+)\s+AS\s+(.+)$""".r
    def unapply(s: String): Option[(String, String)] =
      R.findFirstMatchIn(s).map(m => (m.group(1), m.group(2)))
  }

  /** `PRIMARY KEY (a, b) [NOT ENFORCED]` table constraint. */
  private object PkConstraint {
    private val R =
      """(?is)^PRIMARY\s+KEY\s*\(([^)]*)\)\s*(?:NOT\s+ENFORCED)?$""".r
    def unapply(s: String): Option[String] =
      R.findFirstMatchIn(s).map(_.group(1))
  }

  /** `name AS <expr>` computed (virtual) column, e.g. `proc_time AS
    * PROCTIME()` (reference flink-ddl.sql:10). */
  private object ComputedCol {
    private val R = """(?is)^(`[^`]+`|\w+)\s+AS\s+(.+)$""".r
    def unapply(s: String): Option[(String, String)] =
      R.findFirstMatchIn(s).map(m => (m.group(1), m.group(2)))
  }

  /** `name TYPE [PRIMARY KEY [NOT ENFORCED]] [NOT NULL]`. */
  private object ColumnDef {
    private val R =
      ("""(?is)^(`[^`]+`|\w+)\s+(.+?)""" +
        """(\s+PRIMARY\s+KEY(?:\s+NOT\s+ENFORCED)?)?(\s+NOT\s+NULL)?$""").r
    def unapply(s: String): Option[(String, String, Boolean)] =
      R.findFirstMatchIn(s).map(m =>
        (m.group(1), m.group(2).trim, m.group(3) != null))
  }

  private def stripTicks(s: String): String =
    if (s.startsWith("`") && s.endsWith("`")) s.substring(1, s.length - 1)
    else s

  /** From `s(open) == '('`, return (inner text, text after the matching
    * close paren). Quotes and backticks shield their content. */
  private def balanced(s: String, open: Int): Option[(String, String)] = {
    var i = open + 1
    var depth = 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '`' => quote = c
        case '('        => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return Some((s.substring(open + 1, i), s.substring(i + 1)))
        case _ => ()
      }
      i += 1
    }
    None
  }

  /** Split on `sep` at nesting depth 0 of both `()` and `<>`, outside
    * quotes/backticks. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '`' => quote = c; cur += c
        case '(' | '<' => depth += 1; cur += c
        case ')' | '>' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  /** Flink SQL type → Spark type. Bare DECIMAL is DECIMAL(10,0) in both
    * engines (the reference's `amount DECIMAL`, flink-ddl.sql:4). */
  private[graft] def parseType(s0: String): DataType = {
    val s = s0.trim
    val up = s.toUpperCase
    def angleInner: String = {
      val a = s.indexOf('<')
      val b = s.lastIndexOf('>')
      require(a >= 0 && b > a, s"malformed type: $s")
      s.substring(a + 1, b)
    }
    if (up.startsWith("ARRAY")) ArrayType(parseType(angleInner))
    else if (up.startsWith("MAP")) {
      val parts = splitTop(angleInner, ',')
      require(parts.length == 2, s"malformed MAP type: $s")
      MapType(parseType(parts(0)), parseType(parts(1)))
    } else if (up.startsWith("ROW")) {
      val fs = splitTop(angleInner, ',').map(_.trim).map { f =>
        val m = """(?s)^(`[^`]+`|\w+)\s+(.+)$""".r.findFirstMatchIn(f)
          .getOrElse(throw new IllegalArgumentException(
            s"malformed ROW field: '$f'"))
        StructField(stripTicks(m.group(1)), parseType(m.group(2)))
      }
      StructType(fs)
    } else if (up.startsWith("DECIMAL") || up.startsWith("NUMERIC")) {
      val ps = """\((\d+)\s*,\s*(\d+)\)""".r.findFirstMatchIn(s)
      val p = """\((\d+)\)""".r.findFirstMatchIn(s)
      ps.map(m => DecimalType(m.group(1).toInt, m.group(2).toInt))
        .orElse(p.map(m => DecimalType(m.group(1).toInt, 0)))
        .getOrElse(DecimalType(10, 0))
    } else up.takeWhile(c => c.isLetter || c == '_') match {
      case "STRING" | "VARCHAR" | "CHAR"       => StringType
      case "INT" | "INTEGER"                   => IntegerType
      case "BIGINT"                            => LongType
      case "SMALLINT"                          => ShortType
      case "TINYINT"                           => ByteType
      case "DOUBLE"                            => DoubleType
      case "FLOAT" | "REAL"                    => FloatType
      case "BOOLEAN"                           => BooleanType
      case "DATE"                              => DateType
      case "TIMESTAMP" | "TIMESTAMP_LTZ"       => TimestampType
      case "BYTES" | "BINARY" | "VARBINARY"    => BinaryType
      case other => throw new IllegalArgumentException(
        s"unsupported column type: '$s0' ($other)")
    }
  }

  /** Split a multi-statement script on top-level `;`, dropping `--`
    * comment lines — so the reference's flink-ddl.sql executes
    * top-to-bottom through one code path ([[Engine.sqlScript]]). */
  def statements(script: String): Seq[String] =
    splitTop(script.linesIterator
      .filterNot(_.trim.startsWith("--")).mkString("\n"), ';')
      .map(_.trim).filter(_.nonEmpty)
}
