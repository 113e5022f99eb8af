package graft.model

import java.nio.charset.StandardCharsets
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Connector-credential crypto ≙ reference `decrypt_pass`
  * (`utils/helper_functions.py:54-74`): AES-256-GCM with hex-encoded
  * ciphertext, auth tag, IV, and key (key from env `KEY_HEX` in the
  * reference). Driver-side by design — it decrypts ONE password per
  * connector before a session reaches executors; bulk column crypto uses
  * the distributed expressions in [[graft.transform.Transforms]] instead.
  */
object Credentials {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def hex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString

  /** Minimal JSON string codec — the reference json.loads/dumps the quoted
    * password, so escape sequences must be honored (stripping only the
    * outer quotes would mangle any password containing `"` or `\`).
    */
  private def jsonUnescape(s: String): String = {
    require(s.length >= 2 && s.head == '"' && s.last == '"',
      s"expected a JSON string, got: $s")
    val body = s.substring(1, s.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\') {
        if (i + 1 >= body.length)
          throw new IllegalArgumentException(s"truncated escape in JSON string: $s")
        body.charAt(i + 1) match {
          case '"'  => sb += '"';  i += 2
          case '\\' => sb += '\\'; i += 2
          case '/'  => sb += '/';  i += 2
          case 'n'  => sb += '\n'; i += 2
          case 't'  => sb += '\t'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case 'b'  => sb += '\b'; i += 2
          case 'f'  => sb += '\f'; i += 2
          case 'u'  =>
            if (i + 6 > body.length)
              throw new IllegalArgumentException(s"truncated \\u escape in JSON string: $s")
            val hexDigits = body.substring(i + 2, i + 6)
            if (!hexDigits.forall(d => Character.digit(d, 16) >= 0))
              throw new IllegalArgumentException(s"invalid \\u escape '$hexDigits' in JSON string: $s")
            sb += Integer.parseInt(hexDigits, 16).toChar
            i += 6
          case other =>
            // json.loads (the reference behavior) rejects unknown escapes
            throw new IllegalArgumentException(s"invalid escape '\\$other' in JSON string: $s")
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def jsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** ≙ `decrypt_pass(encrypted_hex, tag_hex, key_hex, iv_hex)`: GCM
    * decrypt, then JSON-decode the plaintext (the reference stores the
    * json.dumps'd password string).
    */
  def decryptPassword(
      encryptedHex: String,
      tagHex: String,
      keyHex: String,
      ivHex: String): String = {
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(
      Cipher.DECRYPT_MODE,
      new SecretKeySpec(unhex(keyHex), "AES"),
      new GCMParameterSpec(128, unhex(ivHex)))
    // JCE expects ciphertext || tag
    val plain = cipher.doFinal(unhex(encryptedHex) ++ unhex(tagHex))
    jsonUnescape(new String(plain, StandardCharsets.UTF_8))
  }

  /** Test/fixture helper: produce the reference's wire format
    * (cipher hex, tag hex) for a password under (key, iv).
    */
  def encryptPassword(
      password: String,
      keyHex: String,
      ivHex: String): (String, String) = {
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(
      Cipher.ENCRYPT_MODE,
      new SecretKeySpec(unhex(keyHex), "AES"),
      new GCMParameterSpec(128, unhex(ivHex)))
    val out = cipher.doFinal(jsonEscape(password).getBytes(StandardCharsets.UTF_8))
    val (ct, tag) = out.splitAt(out.length - 16)
    (hex(ct), hex(tag))
  }
}
