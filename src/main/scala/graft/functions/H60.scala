package graft.functions

/** The repo-wide engine-portable 60-bit fingerprint: the first 15 hex
  * chars of an md5 digest parsed base-16 — equivalently the first 8
  * digest bytes big-endian, logical-shifted right one nibble. DuckDB
  * states the identical value with
  * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)` /
  * `conv(substr(md5_hex, 1, 15), 16, 10)`. ONE definition so every
  * kernel that fingerprints ([[SubstrHashes]] windows,
  * [[WordShingleHashes]] shingles) provably shares the discipline —
  * two hand-rolled bit spellings would have to be proven equivalent
  * separately and fixed in two places.
  */
object H60 {
  def ofDigest(d: Array[Byte]): Long = {
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    be >>> 4
  }
}
