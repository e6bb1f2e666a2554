package graft.cdc

import java.nio.file.{Files, Paths}

/** Golden CDC fixtures: the reference's two captured Debezium payloads
  * (reference: sample/cdc.orders.change-log-mysql.json,
  * sample/cdc.crawler.change-log-mongodb.json — the repo's only
  * test-asset-like files, adopted as parser fixtures per SURVEY §5).
  * Each file holds several pretty-printed top-level JSON documents (a key
  * message then a value message); [[splitJsonDocs]] separates them with a
  * quote-aware brace scan. */
object Fixtures {
  val sampleDir = "/root/reference/sample"

  def read(name: String): String =
    new String(Files.readAllBytes(Paths.get(s"$sampleDir/$name")), "UTF-8")

  /** Split a text containing several concatenated top-level JSON objects. */
  def splitJsonDocs(text: String): Seq[String] = {
    val docs = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = -1
    text.zipWithIndex.foreach { case (c, i) =>
      if (esc) esc = false
      else if (inStr) c match {
        case '\\' => esc = true
        case '"' => inStr = false
        case _ =>
      } else c match {
        case '"' => inStr = true
        case '{' =>
          if (depth == 0) start = i
          depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) { docs += text.substring(start, i + 1); start = -1 }
        case _ =>
      }
    }
    docs.result()
  }

  /** The value (envelope) documents of a sample file — every top-level doc
    * whose payload is an object with an `op` (key messages have scalar
    * payloads). */
  def envelopes(name: String): Seq[String] =
    splitJsonDocs(read(name)).filter(_.contains("\"op\""))

  def mysqlOrdersEnvelope: String =
    envelopes("cdc.orders.change-log-mysql.json").head

  def mongoCommentsEnvelope: String =
    envelopes("cdc.crawler.change-log-mongodb.json").head
}
