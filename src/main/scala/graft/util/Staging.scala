package graft.util

/** Collision-safe per-input staging directories under the system tmpdir —
  * shared by the file-stream staging (StreamingOps.eventsReadStream) and
  * the compaction gate (ScaleQueries). The name keys on a cryptographic
  * digest of the input path (a sanitized path alone still collides —
  * '/a.b' vs '/a_b' — and can exceed filename limits; String.hashCode
  * collides too) plus a short readable suffix.
  */
object Staging {
  def dir(prefix: String, key: String): java.nio.file.Path = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
    val suffix = key.replaceAll("[^A-Za-z0-9]", "_").takeRight(24)
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), s"${prefix}_${digest}_$suffix")
  }
}
