package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Collision-safe composite state/sink keys.
  *
  * A raw `concat_ws("|", a, b)` key merges DISTINCT pairs when a
  * component contains the delimiter — ("a|b", "c") and ("a", "b|c")
  * both render "a|b|c" — silently cross-wiring their upserts/deletes in
  * an id-keyed state table or sink (ADVICE r5). Base64-encoding the
  * FIRST component removes the ambiguity: base64 emits no '|', so the
  * first field always ends at the first delimiter, and the second
  * component rides verbatim (nothing parses it back out of the key;
  * consumers read the explicit doc_a/doc_b columns). Keys stay
  * deterministic, so replay-idempotence is unaffected.
  */
object Keys {
  def pair(a: Column, b: Column): Column =
    concat_ws("|", base64(encode(a.cast("string"), "UTF-8")), b)
}
