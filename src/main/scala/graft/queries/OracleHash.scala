package graft.queries

/** THE cross-engine deterministic bucket-hash convention (established
  * by CurationQueries.hashSplit, reused by the split / fold / sampling
  * / A-B operators): the first 16 bits of md5 over the UTF-8 bytes of
  * a string expression, as a BIGINT, optionally mod a bucket count.
  * One definition of each side so the Spark expression and its DuckDB
  * mirror cannot drift independently — md5 of the same bytes is the
  * one hash both engines compute identically.
  */
private[queries] object OracleHash {

  /** Spark SQL fragment; `c` is a Spark SQL string expression. */
  def bucketExpr(c: String): String =
    s"cast(conv(substring(md5(cast($c as binary)), 1, 4), 16, 10) as long)"

  def bucketExpr(c: String, mod: Int): String = s"${bucketExpr(c)} % $mod"

  /** DuckDB mirror; `c` must be a VARCHAR expression. */
  def bucketSql(c: String): String =
    s"CAST(concat('0x', substr(md5($c), 1, 4)) AS BIGINT)"

  def bucketSql(c: String, mod: Int): String = s"${bucketSql(c)} % $mod"
}
