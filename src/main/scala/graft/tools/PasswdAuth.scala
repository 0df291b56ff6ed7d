package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import javax.security.sasl.AuthenticationException

import org.apache.hive.service.auth.PasswdAuthenticationProvider

/** File-backed password authentication for the JDBC endpoint ≡ the
  * reference's Trino PASSWORD-file auth
  * (trino/conf/trino/config.properties:15 sets
  * `http-server.authentication.type=PASSWORD`;
  * trino/conf/trino/password-authenticator.properties:1-2 points it at a
  * credentials file). Same shape here: a local file of `user:salt:digest`
  * lines, one per principal, wired into HiveServer2's CUSTOM auth hook —
  * Hive instantiates this class reflectively (no-arg constructor) when
  * `hive.server2.authentication=CUSTOM` and
  * `hive.server2.custom.authentication.class=graft.tools.PasswdAuth`.
  *
  * Storage is salted SHA-256 (`hex(sha256(salt ∥ utf8(password)))` with a
  * random per-user 16-byte salt), so the file never holds plaintext and
  * equal passwords get distinct digests. The file path travels through the
  * `graft.sql.passwd.file` system property because Hive's reflective
  * construction path offers no other conf channel for a custom provider.
  *
  * Scale note: auth happens once per JDBC session open, entirely on the
  * endpoint host — zero executor involvement, zero per-query cost.
  */
class PasswdAuth extends PasswdAuthenticationProvider {
  // Hive's SASL PLAIN callback invokes this per connection attempt.
  override def Authenticate(user: String, password: String): Unit = {
    val path = System.getProperty(PasswdAuth.PASSWD_FILE_PROP)
    if (path == null)
      throw new AuthenticationException(
        s"no password file configured (${PasswdAuth.PASSWD_FILE_PROP})")
    if (!PasswdAuth.check(Paths.get(path), user, password))
      throw new AuthenticationException(s"invalid credentials for '$user'")
  }
}

object PasswdAuth {
  val PASSWD_FILE_PROP = "graft.sql.passwd.file"

  private def sha256Hex(salt: Array[Byte], password: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(salt)
    md.update(password.getBytes(UTF_8))
    md.digest().map(b => f"$b%02x").mkString
  }

  private def hex2bytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Write (or overwrite) a credentials file from plaintext pairs. Salts are
    * freshly random per call; the plaintext never touches disk.
    */
  def writePasswordFile(path: Path, creds: Map[String, String]): Unit = {
    val rnd = new java.security.SecureRandom()
    val lines = creds.toSeq.sortBy(_._1).map { case (user, pw) =>
      require(!user.contains(":") && !user.contains("\n"),
        s"user name must not contain ':' or newline: $user")
      val salt = new Array[Byte](16)
      rnd.nextBytes(salt)
      s"$user:${salt.map(b => f"$b%02x").mkString}:${sha256Hex(salt, pw)}"
    }
    Files.write(path, (lines.mkString("\n") + "\n").getBytes(UTF_8))
  }

  /** Constant-shape verify: parse the user's line, re-derive the salted
    * digest, compare with MessageDigest.isEqual (timing-safe).
    */
  def check(path: Path, user: String, password: String): Boolean = {
    if (!Files.isReadable(path)) return false
    import scala.jdk.CollectionConverters._
    Files.readAllLines(path, UTF_8).asScala.exists { line =>
      line.split(":", 3) match {
        case Array(u, saltHex, digestHex) if u == user =>
          MessageDigest.isEqual(
            sha256Hex(hex2bytes(saltHex), password).getBytes(UTF_8),
            digestHex.getBytes(UTF_8))
        case _ => false
      }
    }
  }
}
