package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE cross-engine hashing recipe (SURVEY §5 determinism contract): an
  * int64 derived from an md5 hex prefix. md5 renders identically in every
  * engine, and ≤ 15 hex chars (60 bits) stays positive in an int64, so the
  * DuckDB oracle computes the identical value via
  * `CAST(('0x' || substr(md5(x), 1, n)) AS BIGINT)`. Every operator that
  * needs engine-portable hashing (minhash families, SimHash bits, sampling
  * buckets) MUST go through this one definition — a second copy that
  * drifts breaks Spark↔oracle parity silently. */
object Hashing {
  def md5Long(s: Column, hexChars: Int): Column = {
    require(hexChars >= 1 && hexChars <= 15,
      s"md5Long needs 1..15 hex chars to stay positive in int64: $hexChars")
    // full width rides the native expression ([[Md5Long60]] — same value,
    // no hex-string round-trip; the interpreted-lambda hot paths need it);
    // narrower widths keep the composed chain
    if (hexChars == 15) Md5Long60.md5Long60(s)
    else conv(substring(md5(s), 1, hexChars), 16, 10).cast("long")
  }
}
