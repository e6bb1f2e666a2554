package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 stand-in with a REAL source seam: a DataSourceV2 `MicroBatchStream`
  * that replays captured Kafka/Debezium dumps from a directory — the
  * kafka-shaped columns (`topic, partition, offset, key, value,
  * timestamp`), exact offset-range batch planning, checkpoint
  * restart-from-offset, admission control (`maxOffsetsPerTrigger`-style
  * rate limiting) and Trigger.AvailableNow, none of which a MemoryStream
  * test exercises (r11 VERDICT #1: with an embedded broker proven
  * impossible in this env — COVERAGE.md S1 — the DSv2 seam itself was
  * the one untested layer between the wire and [[KafkaCdc.toCdcInput]]).
  *
  * Directory layout: each file is one topic's dump, topic = file name
  * minus its final extension (`shard1.ec.orders.jsonl` → topic
  * `shard1.ec.orders`, matching the reference's `<server>.<db>.<table>`
  * topic naming, README.md:133-150). Two dump formats:
  *
  *  - `*.jsonl`: one envelope JSON per line (key-less messages);
  *  - anything else: concatenated pretty-printed top-level JSON docs in
  *    the EXACT shape of the reference's captured console dumps
  *    (sample/cdc.orders.change-log-mysql.json — alternating key doc /
  *    value doc; a doc containing `"op"` is a value message, a doc
  *    before it without one is its key).
  *
  * Offsets are a single global sequence over (file name asc, position in
  * file) — a total order like a single-partition Kafka topic, which is
  * what the engine's `seq` contract wants ([[KafkaCdc.toCdcInput]]);
  * `latestOffset` re-lists the directory, so files appended between
  * restarts are picked up exactly at the committed offset. Batch reads
  * (`spark.read.format("graft-replay")`) see the full dump.
  *
  * Scale posture: this is a REPLAY source — its job is fidelity to the
  * source API, not 100 TB throughput. Still, batches plan as contiguous
  * offset slices across `numPartitions` input partitions, the parsed
  * dump is cached per executor JVM keyed by a (name, size, mtime)
  * fingerprint, and nothing buffers on the driver but the offset longs.
  */
class ReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ReplayTable(new CaseInsensitiveStringMap(properties))
}

object ReplaySource {
  /** Kafka's read schema, with STRING key/value: every consumer in this
    * repo immediately casts the bytes to string (the dumps are JSON
    * text), and string columns keep the replayed frames
    * oracle-inspectable. */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))

  /** Deterministic message timestamp: a fixed base (2021-01-01, the
    * reference capture era) + 1s per offset — replay runs must be
    * bit-reproducible, so no wall clock. */
  private[sources] val baseMicros = 1609459200000000L

  final case class Record(topic: String, key: String, value: String)

  // parsed-dump cache, keyed by directory + content fingerprint: one
  // parse per executor JVM per dump version, however many batches replay
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), IndexedSeq[Record]]

  private def listFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Seq.empty
    Files.list(p).iterator().asScala
      .filter(f => Files.isRegularFile(f))
      .toSeq.sortBy(_.getFileName.toString)
  }

  private def fingerprint(files: Seq[Path]): String =
    files.map(f => s"${f.getFileName}:${Files.size(f)}:" +
      s"${Files.getLastModifiedTime(f).toMillis}").mkString("|")

  /** Split concatenated top-level JSON objects (quote-aware brace scan —
    * the captured dumps are pretty-printed with blank lines between
    * documents, not line-delimited). */
  private[sources] def splitJsonDocs(text: String): Seq[String] = {
    val docs = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var esc = false; var start = -1
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (esc) esc = false
      else if (inStr) c match {
        case '\\' => esc = true
        case '"' => inStr = false
        case _ =>
      } else c match {
        case '"' => inStr = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) { docs += text.substring(start, i + 1); start = -1 }
        case _ =>
      }
      i += 1
    }
    docs.result()
  }

  private def topicOf(f: Path): String = {
    val n = f.getFileName.toString
    val dot = n.lastIndexOf('.')
    if (dot > 0) n.substring(0, dot) else n
  }

  private def parseFile(f: Path): Seq[Record] = {
    val topic = topicOf(f)
    val text = new String(Files.readAllBytes(f), "UTF-8")
    if (f.getFileName.toString.endsWith(".jsonl"))
      text.linesIterator.map(_.trim).filter(_.nonEmpty)
        .map(l => Record(topic, null, l)).toSeq
    else {
      // console-dump pairing: value docs carry "op"; a non-value doc is
      // the key of the next value (Kafka dumps print key then value)
      val out = Seq.newBuilder[Record]
      var pendingKey: String = null
      splitJsonDocs(text).foreach { doc =>
        if (doc.contains("\"op\"")) {
          out += Record(topic, pendingKey, doc)
          pendingKey = null
        } else pendingKey = doc
      }
      out.result()
    }
  }

  /** The dump as one globally-ordered record sequence. The in-memory
    * IndexedSeq bounds a replay dump at Int.MaxValue records — far past
    * any captured console dump; a larger corpus belongs on the real
    * connector, not a replay fixture. */
  private[sources] def load(dir: String): IndexedSeq[Record] = {
    val files = listFiles(dir)
    // every dump GROWTH step keys a fresh entry; keep the cache from
    // accumulating stale versions across a long-lived session (a replay
    // dump is small — re-parsing after a clear is cheap)
    if (cache.size > 16) cache.clear()
    cache.getOrElseUpdate((dir, fingerprint(files)),
      files.flatMap(parseFile).toIndexedSeq)
  }
}

final class ReplayTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException(
      "graft-replay requires option 'path' (directory of captured dumps)"))
  private val maxPerBatch: Long =
    Option(options.get("maxRecordsPerBatch")).map(_.toLong)
      .getOrElse(Long.MaxValue)
  private val numPartitions: Int =
    Option(options.get("numPartitions")).map(_.toInt).getOrElse(4)

  override def name(): String = s"graft-replay:$path"
  override def schema(): StructType = ReplaySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ReplaySource.schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            ReplayMicroBatchStream.slice(path,
              0L, ReplaySource.load(path).length.toLong, numPartitions)
          override def createReaderFactory(): PartitionReaderFactory =
            new ReplayReaderFactory
        }
        override def toMicroBatchStream(ckpt: String): MicroBatchStream =
          new ReplayMicroBatchStream(path, maxPerBatch, numPartitions)
      }
    }
}

/** Offset = count of records consumed (a single global sequence). */
final case class ReplayOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

final class ReplayMicroBatchStream(path: String, maxPerBatch: Long,
    numPartitions: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // end of data at prepareForTriggerAvailableNow time: AvailableNow must
  // drain what existed at query start (across however many rate-limited
  // batches) and then stop, even if the directory keeps growing
  @volatile private var availableNowCap: Long = -1L
  @volatile private var committedUpTo: Long = 0L

  private def total: Long = ReplaySource.load(path).length.toLong

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.trim.toLong)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = total

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerBatch)

  /** The admission-controlled planning call Spark actually uses (the
    * no-arg variant below is dead under SupportsAdmissionControl, as in
    * the Kafka source). `start` comes from the OFFSET LOG on restart —
    * this is the seam that makes kill-and-restart resume exactly. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ReplayOffset].index
    val avail = if (availableNowCap >= 0) availableNowCap else total
    val cap = limit match {
      case r: ReadMaxRows => math.min(avail, from + r.maxRows())
      case _ => avail
    }
    ReplayOffset(math.max(from, cap))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used under SupportsAdmissionControl")

  override def reportLatestOffset(): Offset = ReplayOffset(total)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    ReplayMicroBatchStream.slice(path,
      start.asInstanceOf[ReplayOffset].index,
      end.asInstanceOf[ReplayOffset].index, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayReaderFactory

  override def commit(end: Offset): Unit =
    committedUpTo = end.asInstanceOf[ReplayOffset].index

  /** Last offset the engine reported durable — observable for tests. */
  def committed: Long = committedUpTo

  override def stop(): Unit = ()
}

object ReplayMicroBatchStream {
  /** Contiguous offset slices of [start, end), ≤ `parts` partitions. */
  private[sources] def slice(path: String, start: Long, end: Long,
      parts: Int): Array[InputPartition] = {
    val n = end - start
    if (n <= 0) return Array.empty
    val k = math.min(parts.toLong, n).toInt
    (0 until k).map { i =>
      ReplayInputPartition(path,
        start + i * n / k, start + (i + 1) * n / k)
    }.toArray
  }
}

final case class ReplayInputPartition(path: String, start: Long, end: Long)
    extends InputPartition

final class ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ReplayInputPartition]
    new PartitionReader[InternalRow] {
      private val records = ReplaySource.load(part.path)
      private var i = part.start - 1

      override def next(): Boolean = { i += 1; i < part.end }

      override def get(): InternalRow = {
        val r = records(i.toInt)
        InternalRow(
          UTF8String.fromString(r.topic),
          0,
          i,
          if (r.key == null) null else UTF8String.fromString(r.key),
          UTF8String.fromString(r.value),
          ReplaySource.baseMicros + i * 1000000L)
      }

      override def close(): Unit = ()
    }
  }
}
