package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.Tables

/** Table metadata registry — the Spark-side stand-in for the reference's
  * session catalog (reference: README.md:342 "DDL creates session-level
  * metadata only"; flink-ddl.sql:9 `PRIMARY KEY (id) NOT ENFORCED`).
  *
  * `primaryKey` drives changelog materialization keys and upsert-sink doc
  * ids (reference: flink-ddl.sql:96-109 ES sinks upsert by PK).
  * `options` carries connector options (topic, url, ...) the way Flink DDL
  * `WITH (...)` does; `copy(options = ...)` is the analog of
  * `CREATE TABLE ... LIKE src (EXCLUDING OPTIONS)` (reference:
  * README.md:215-225).
  */
final case class TableSpec(
    name: String,
    schema: StructType,
    primaryKey: Seq[String] = Nil,
    options: Map[String, String] = Map.empty)

/** The SQL front door: a session-scoped engine instance holding the spec
  * catalog and exposing `sql(...)` over registered tables — the role of
  * Flink's sql-client session (reference: README.md:100-104, 342). DDL
  * mutates only this catalog; queries plan through stock Catalyst. */
final class Engine(val spark: SparkSession) {
  val catalog = new Engine.Catalog

  /** Register a parquet-backed table: spec in the catalog + temp view so
    * SQL references it by name (the reference's `CREATE TABLE ... WITH`,
    * flink-ddl.sql:1-19). */
  def registerParquet(name: String, dir: String,
      primaryKey: Seq[String] = Nil): TableSpec = {
    val df = Tables.load(spark, dir, name)
    df.createOrReplaceTempView(name)
    val spec = TableSpec(name, df.schema, primaryKey,
      Map("connector" -> "parquet", "path" -> s"$dir/$name.parquet"))
    catalog.register(spec)
    spec
  }

  /** `CREATE TABLE new LIKE src (EXCLUDING/INCLUDING OPTIONS)` (reference:
    * README.md:215-225, :252-254): clone the spec, swap options, and point
    * a view at the new connector location when one is given. */
  def registerLike(newName: String, src: String,
      options: Map[String, String] = Map.empty): TableSpec = {
    val spec = catalog.registerLike(newName, src, options)
    options.get("path").foreach { p =>
      spark.read.schema(spec.schema).parquet(p)
        .createOrReplaceTempView(newName)
    }
    spec
  }

  /** Continuous-DML registrar, wired by
    * [[graft.streaming.CdcSqlSession.attachTo]]: receives
    * (sinkName, select) for INSERT INTO statements over dynamic tables. */
  private var continuousInsert: Option[(String, String) => Unit] = None
  def onContinuousInsert(f: (String, String) => Unit): Unit =
    continuousInsert = Some(f)

  /** The statement front door. `INSERT INTO <sink> SELECT ...` — the
    * reference's flagship DML (flink-ddl.sql:179-259) — either appends
    * into a parquet-registered table (static targets) or registers a
    * continuous view on the attached streaming session (dynamic targets,
    * reference entry point 1, README.md:342-345).
    * `CREATE TABLE <name> (<cols>) WITH ('connector'=..., ...)` — the
    * reference's table-declaration surface, its very first statement
    * (flink-ddl.sql:1-19) — registers spec + view via [[createTable]].
    * `CREATE TABLE <new> [WITH (...)] LIKE <src> [(INCLUDING|EXCLUDING
    * OPTIONS)]` — the reference's definition-clone DDL (README.md:215-225
    * EXCLUDING, :252-254 INCLUDING) — mutates only the session catalog,
    * like Flink (README.md:342: DDL creates session metadata, no job).
    * Everything else plans through stock Catalyst, after the
    * [[FlinkDialect]] shims (salt elision, COLLECT(ROW(...))) so the
    * reference's DML statements run verbatim. */
  def sql(rawStmt: String): DataFrame = {
    val stmt = FlinkDialect.normalize(rawStmt)
    stmt match {
    case Ddl.CreateTableStmt(ct) =>
      createTable(ct)
      spark.emptyDataFrame
    case Engine.CreateLike(newNameRaw, withOpts, srcRaw, mode) =>
      val (newName, src) = (localName(newNameRaw), localName(srcRaw))
      checkCollision(newName, newNameRaw)
      val overrides = Option(withOpts).toSeq.flatMap(
        Engine.OptionPair.findAllMatchIn(_).map(m => m.group(1) -> m.group(2)))
      val base =
        if (mode != null && mode.equalsIgnoreCase("INCLUDING"))
          // the source's qualified-name is ITS identity, not the clone's
          catalog.get(src).map(_.options - "qualified-name")
            .getOrElse(Map.empty)
        else Map.empty[String, String] // EXCLUDING is Flink's default-ish safe clone
      val qualified =
        if (newName == newNameRaw) Map.empty[String, String]
        else Map("qualified-name" -> newNameRaw)
      registerLike(newName, src, base ++ overrides ++ qualified)
      spark.emptyDataFrame
    case _ => graft.streaming.SqlInsert.parse(stmt) match {
      case Some((targetRaw, select)) =>
        val target = localName(targetRaw)
        catalog.get(target) match {
          case Some(spec)
              if spec.options.get("connector").contains("parquet") =>
            val path = spec.options("path")
            query(select).write.mode("append").parquet(path)
            // re-point the temp view so later queries see the insert
            spark.read.schema(spec.schema).parquet(path)
              .createOrReplaceTempView(target)
            spark.emptyDataFrame
          case _ => continuousInsert match {
            case Some(f) => f(target, select); spark.emptyDataFrame
            case None => throw new IllegalArgumentException(
              s"INSERT INTO $target: target is not a parquet table and " +
                "no streaming session is attached (CdcSqlSession.attachTo)")
          }
        }
      case None => query(stmt)
    }
    }
  }

  /** Plain query path: Flink's `FOR SYSTEM_TIME AS OF` temporal join
    * compiles onto [[graft.operators.AsOf.asofBackward]]'s one-shuffle
    * window form ([[TemporalSql]]); everything else is stock Catalyst. */
  private def query(select: String): DataFrame =
    TemporalSql.rewrite(spark, catalog, select)
      .getOrElse(spark.sql(select))

  /** Run a multi-statement script (e.g. the reference's flink-ddl.sql
    * top-to-bottom) through [[sql]]; returns the last statement's frame. */
  def sqlScript(script: String): DataFrame =
    Ddl.statements(script).foldLeft(spark.emptyDataFrame)((_, s) => sql(s))

  /** Materialize a parsed `CREATE TABLE ... WITH (connector)`:
    *  - catalog spec always (schema + PK + options + computed columns as
    *    `computed.<name>` options — DDL is session metadata, README.md:342);
    *  - `'connector'='parquet'/'filesystem'` with a path binds a view over
    *    those files (the batch-queryable case);
    *  - every other connector (mysql-cdc, kafka, elasticsearch-7, jdbc)
    *    binds the name to an EMPTY relation of the declared schema: batch
    *    SQL over the name parses and runs (no data until a stream starts —
    *    dynamic-table semantics), and an attached [[graft.streaming
    *    .CdcSqlSession]] re-binds it to materialized state per batch. */
  /** Temp views and the spec catalog are single-part namespaces, so a
    * catalog-qualified Flink name (`db.orders`) is normalized to its
    * LAST segment at this boundary — consistently for DDL, LIKE clones
    * and INSERT targets, or half the paths would look a name up under
    * the form the other half didn't register. The original qualified
    * name is retained as spec metadata.
    *
    * Splitting honors backtick quoting (ADVICE r5): a quoted identifier
    * may contain a LITERAL dot (`` `my.table` ``) that is part of the
    * name, not a namespace separator — a naive split truncated it to the
    * post-dot segment. Only top-level dots separate; quotes are stripped
    * from the result (the catalog stores bare names).
    *
    * Known restriction (documented, matching the single-part catalog):
    * normalization applies to statement TARGETS (DDL names, LIKE
    * sources, INSERT sinks). A qualified reference inside a SELECT body
    * (`... FROM db.src`) is passed to Spark as written and will not
    * resolve against the temp view registered under `src` — reference
    * tables inside query bodies by their single-part name. */
  private def localName(n: String): String = {
    val segs = scala.collection.mutable.ArrayBuffer(new StringBuilder)
    var inQuote = false
    n.foreach {
      case '`' => inQuote = !inQuote
      case '.' if !inQuote => segs += new StringBuilder
      case c => segs.last += c
    }
    segs.last.result()
  }

  /** Two (qualified) names sharing a last segment would silently rebind
    * one another's view — fail fast instead. Re-declaring the SAME name
    * is fine (CREATE TABLE is idempotent-by-name here). */
  private def checkCollision(local: String, declared: String): Unit =
    catalog.get(local).foreach { prev =>
      val prevQ = prev.options.getOrElse("qualified-name", prev.name)
      if (prevQ != declared)
        throw new IllegalArgumentException(
          s"table name collision: '$prevQ' and '$declared' both bind " +
            s"local name '$local'")
    }

  def createTable(ct: Ddl.CreateTable): TableSpec = {
    val name = localName(ct.name)
    val qualified =
      if (name == ct.name) Map.empty[String, String]
      else Map("qualified-name" -> ct.name)
    checkCollision(name, ct.name)
    val spec = TableSpec(name, ct.schema, ct.primaryKey,
      ct.options ++ qualified ++
        ct.computed.map { case (n, e) => s"computed.$n" -> e } ++
        ct.watermark.map { case (c, e) => s"watermark.$c" -> e })
    catalog.register(spec)
    ct.options.get("connector") match {
      case Some("parquet" | "filesystem") if ct.options.contains("path") =>
        spark.read.schema(ct.schema).parquet(ct.options("path"))
          .createOrReplaceTempView(name)
      case _ =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ct.schema)
          .createOrReplaceTempView(name)
    }
    spec
  }

  /** The catalog's CDC-source specs — what a [[graft.streaming
    * .CdcSqlSession]] is built over after DDL registration. */
  def cdcSources: Seq[TableSpec] = catalog.list.filter(s =>
    Set("mysql-cdc", "kafka", "mongodb-cdc")
      .contains(s.options.getOrElse("connector", "")))
}

object Engine {
  def apply(spark: SparkSession): Engine = new Engine(spark)

  /** `CREATE TABLE <new> [WITH ('k'='v', ...)] LIKE <src>
    * [(INCLUDING|EXCLUDING OPTIONS)]` (reference README.md:215-225). */
  private val CreateLike =
    ("""(?is)^\s*CREATE\s+TABLE\s+`?([\w.]+)`?\s*""" +
      """(?:WITH\s*\(([^)]*)\)\s*)?LIKE\s+`?([\w.]+)`?\s*""" +
      """(?:\(\s*(INCLUDING|EXCLUDING)\s+OPTIONS\s*\))?\s*;?\s*$""").r
  private val OptionPair = """'([^']*)'\s*=\s*'([^']*)'""".r

  /** Session factory with the scale-aware defaults every entry point uses.
    * AQE on (runtime re-plan: skew-join split, shuffle coalescing), UTC for
    * oracle parity, shuffle partitions sized for the local harness via env
    * (a real cluster submit would override both master and partitions).
    */
  def session(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet (events) reads as a raw long; set at
      // session build, not per-read (thread-safety + no ordering deps)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reclaim reliable-checkpoint files once their RDD is GC'd —
      // without this every star-contraction / label-propagation round of
      // a long-running streaming session leaks checkpoint files forever
      // (Spark never deletes them by default)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
    // Default the warehouse (backs `saveAsTable`, e.g. bucketed-table
    // materialization) to a temp dir instead of `$cwd/spark-warehouse` —
    // but never override an explicitly configured one (spark-submit
    // --conf lands in sys.props before the builder runs).
    if (!sys.props.contains("spark.sql.warehouse.dir"))
      builder.config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    // Native functions (rolling_hash, dot_product, word_shingles,
    // char_grams) as SQL names; a user-supplied extensions list wins (it
    // can include graft.GraftExtensions itself).
    if (!sys.props.contains("spark.sql.extensions"))
      builder.config("spark.sql.extensions", "graft.GraftExtensions")
    // Only default the master when none was supplied: spark-submit --master
    // sets the spark.master system property, and a builder-set master would
    // override it — which would pin this entry point to single-node forever.
    val hasMaster =
      sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER")
    val s = (if (hasMaster) builder else builder.master(s"local[$cpus]"))
      .getOrCreate()
    // reliable-checkpoint dir for iterative operators (lineage truncation
    // WITH a recompute-free recovery path — on a cluster this must be a
    // shared filesystem: spark.graft.checkpoint.dir conf, the
    // SPARK_GRAFT_CHECKPOINT_DIR env var, or an explicit setCheckpointDir)
    if (s.sparkContext.getCheckpointDir.isEmpty) {
      val configured = s.conf.getOption("spark.graft.checkpoint.dir")
        .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      val dir = configured.getOrElse(
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      if (configured.isEmpty && !s.sparkContext.isLocal)
        org.slf4j.LoggerFactory.getLogger("graft.Engine")
          .warn("graft: non-local master with a driver-local temp " +
          "checkpoint dir — iterative operators need a shared filesystem; " +
          "set spark.graft.checkpoint.dir")
      s.sparkContext.setCheckpointDir(dir)
    }
    s
  }

  /** Session-scoped table registry (in-memory, like the reference's
    * default catalog — README.md:342,346). */
  final class Catalog {
    private val specs = scala.collection.concurrent.TrieMap.empty[String, TableSpec]
    def register(spec: TableSpec): Unit = specs.put(spec.name, spec)
    def get(name: String): Option[TableSpec] = specs.get(name)
    def list: Seq[TableSpec] = specs.values.toSeq.sortBy(_.name)
    /** CREATE TABLE ... LIKE src (EXCLUDING OPTIONS) analog. */
    def registerLike(newName: String, src: String,
        options: Map[String, String] = Map.empty): TableSpec = {
      val base = specs(src)
      val spec = base.copy(name = newName, options = options)
      register(spec); spec
    }
  }
}
