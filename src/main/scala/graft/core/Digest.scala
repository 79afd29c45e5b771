package graft.core

/** Shared hex digests for content-addressed and collision-proof NAMING
  * (fixture files keyed by their bytes, bulk-export filenames keyed by
  * the full container URI, per-dir fixture roots) — one definition so
  * the naming contracts can't drift between call sites. Not for
  * cryptographic use. */
object Digest {
  def md5Hex(data: Array[Byte], take: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(data).map("%02x".format(_)).mkString.take(take)

  def md5Hex(s: String, take: Int): String =
    md5Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), take)
}
