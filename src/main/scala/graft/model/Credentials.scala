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

  /** ≙ `decrypt_pass(encrypted_hex, tag_hex, key_hex, iv_hex)`: GCM
    * decrypt, then the reference JSON-decodes the plaintext (it stores the
    * quoted password string) — mirrored by stripping surrounding quotes.
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
    val s = new String(plain, StandardCharsets.UTF_8)
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
    else s
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
    val out = cipher.doFinal(("\"" + password + "\"").getBytes(StandardCharsets.UTF_8))
    val (ct, tag) = out.splitAt(out.length - 16)
    (hex(ct), hex(tag))
  }
}
