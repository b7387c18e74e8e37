package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spark's `_metadata.file_path` column carries the percent-ENCODED
  * URI form of the file path (the scan keeps Hadoop's url-encoded
  * `SparkPath` spelling), while table-format logs and manifests store
  * plain filesystem paths — so any anti-join keyed on file identity
  * must decode the metadata side first, or a data file whose name
  * contains a space / '%' / non-ASCII character never matches and its
  * deleted rows silently come back.
  *
  * [[decoded]] inverts the URI percent-encoding exactly: strip the
  * `file:` scheme, protect raw '+' (legal and LITERAL in a URI path,
  * but `url_decode`'s form-codec would turn it into a space), then
  * percent-decode. Both spellings of a plus — raw `+` and `%2B` —
  * land on '+', and `%20`/`%25`/multi-byte UTF-8 escapes decode to
  * their characters, matching `java.net.URI.getPath` semantics on the
  * log side.
  */
object MetaPaths {
  def decoded(c: Column): Column =
    url_decode(regexp_replace(
      regexp_replace(c, "^file:/+", "/"), "\\+", "%2B"))
}
