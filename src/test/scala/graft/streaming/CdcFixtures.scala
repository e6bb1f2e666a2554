package graft.streaming

import org.apache.spark.sql.types._

import graft.TableSpec

/** Shared Debezium-envelope fixtures for streaming-view specs — the
  * (doc_id, text) documents changelog and the (vec_id, embedding)
  * embeddings changelog most suites replay. Factors the seqNo/envelope
  * helper block that was previously copied verbatim per spec (the
  * round-9 review finding); pre-existing suites keep their local copies
  * until touched, new suites should mix these in. */
trait DocCdcFixture {
  protected val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))
  protected val docSources: Seq[TableSpec] =
    Seq(TableSpec("documents", docSchema, primaryKey = Seq("doc_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("documents", env, seqNo)
  }
  protected def img(id: String, text: String): String =
    s"""{"doc_id":"$id","text":"$text"}"""
  protected def create(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, text)},"op":"c","ts_ms":$seqNo}""")
  protected def update(id: String, oldT: String,
      newT: String): (String, String, Long) =
    rec(s"""{"before":${img(id, oldT)},"after":${img(id, newT)},"op":"u","ts_ms":$seqNo}""")
  protected def delete(id: String, text: String): (String, String, Long) =
    rec(s"""{"before":${img(id, text)},"after":null,"op":"d","ts_ms":$seqNo}""")
}

trait EmbeddingCdcFixture {
  protected val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))
  protected val embSources: Seq[TableSpec] =
    Seq(TableSpec("embeddings", embSchema, primaryKey = Seq("vec_id")))

  private var seqNo = 0L
  private def rec(env: String): (String, String, Long) = {
    seqNo += 1; ("embeddings", env, seqNo)
  }
  protected def img(id: Long, v: Seq[Double]): String =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
  protected def create(id: Long, v: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":null,"after":${img(id, v)},"op":"c","ts_ms":$seqNo}""")
  protected def update(id: Long, o: Seq[Double],
      n: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":${img(id, o)},"after":${img(id, n)},"op":"u","ts_ms":$seqNo}""")
  protected def delete(id: Long, v: Seq[Double]): (String, String, Long) =
    rec(s"""{"before":${img(id, v)},"after":null,"op":"d","ts_ms":$seqNo}""")
}
