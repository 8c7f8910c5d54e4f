package graft.client

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import graft.table.RedisSink

/** Socket-level RESP2 Redis client — the deployable binding for
  * [[RedisClients.provider]] (reference surface:
  * python/feathub/online_stores/redis_client.py and Flink's
  * RedisLookupFunction.java; this engine needs only string GET/SET plus
  * connection handshake). Pure JDK sockets, no driver dependency: the
  * sandbox has no Jedis/Lettuce jar, and the protocol subset involved —
  * inline arrays of bulk strings out, simple/bulk/integer/error replies
  * back — is small enough that speaking RESP directly is the sturdier
  * dependency surface.
  *
  * Handshake per connection: `AUTH` (user+password or password-only ACL
  * forms) when a password is set, then `SELECT dbNum` when non-zero.
  * Commands retry ONCE on a broken connection (executor-side long-lived
  * sockets die on idle timeouts; one reconnect covers that, a second
  * failure is a real outage and throws loudly). Replies of type error
  * (`-ERR ...`) always throw — a silent fallback would serve nulls for
  * misconfiguration.
  *
  * Scale shape: executors call the provider once per PARTITION, so
  * connections are pooled per (host, port, user, db) per JVM in
  * [[RespRedis.clientFor]] — a 1000-executor × 32-partition stage opens
  * 1000 sockets, not 32 000. Per-command synchronization serializes
  * tasks sharing the JVM connection; feature-store traffic is
  * small-value point reads/writes, where one pipelined connection per
  * executor is the standard client topology.
  */
final class RespRedisClient(
    host: String,
    port: Int,
    username: String,
    password: String,
    dbNum: Int,
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000) extends RedisStringStore {

  @transient private var sock: Socket = _
  @transient private var in: BufferedInputStream = _
  @transient private var out: BufferedOutputStream = _

  override def put(key: String, value: String): Unit = synchronized {
    exchange(Seq("SET", key, value))
    ()
  }

  override def get(key: String): Option[String] = synchronized {
    Option(exchange(Seq("GET", key)))
  }

  def close(): Unit = synchronized {
    if (sock != null) {
      try sock.close() catch { case _: IOException => }
      sock = null; in = null; out = null
    }
  }

  /** One command round-trip with a single reconnect-and-retry on a broken
    * connection. Returns the reply payload (`null` for a RESP null bulk).
    * Only TRANSPORT failures retry: a server `-ERR` reply is a
    * [[RespErrorException]] and re-raises as-is — re-sending a command
    * the server already rejected (and executed nothing for) would just
    * repeat the refusal, and for a command that FAILED AFTER EXECUTING
    * it would double-apply.
    */
  private def exchange(cmd: Seq[String]): String = {
    ensureConnected()
    try roundTrip(cmd)
    catch {
      case e: RespErrorException => throw e
      case _: IOException =>
        close()
        ensureConnected()
        roundTrip(cmd)
    }
  }

  private def ensureConnected(): Unit = {
    if (sock == null || !sock.isConnected || sock.isClosed) {
      val s = new Socket()
      s.setSoTimeout(readTimeoutMs)
      s.setTcpNoDelay(true)
      s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      sock = s
      in = new BufferedInputStream(s.getInputStream)
      out = new BufferedOutputStream(s.getOutputStream)
      if (password.nonEmpty) {
        if (username.nonEmpty) roundTrip(Seq("AUTH", username, password))
        else roundTrip(Seq("AUTH", password))
      }
      if (dbNum != 0) roundTrip(Seq("SELECT", dbNum.toString))
    }
  }

  private def roundTrip(cmd: Seq[String]): String = {
    out.write(s"*${cmd.length}\r\n".getBytes(UTF_8))
    cmd.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      out.write(b)
      out.write('\r'); out.write('\n')
    }
    out.flush()
    readReply()
  }

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("redis connection closed mid-reply")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n')
      throw new IOException("malformed RESP line terminator")
    sb.toString
  }

  private def readReply(): String = {
    val t = in.read()
    if (t < 0) throw new EOFException("redis connection closed")
    t.toChar match {
      case '+' => readLine()
      case ':' => readLine()
      case '-' =>
        val err = readLine()
        throw new RespErrorException(s"redis error reply: $err")
      case '$' =>
        val n = readLine().toInt
        if (n < 0) null
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new EOFException("redis connection closed mid-bulk")
            off += r
          }
          if (in.read() != '\r' || in.read() != '\n')
            throw new IOException("malformed RESP bulk terminator")
          new String(buf, UTF_8)
        }
      case other =>
        throw new IOException(s"unsupported RESP reply type '$other'")
    }
  }
}

/** A RESP `-ERR ...` reply — a SERVER decision, distinct from the
  * transport IOExceptions that trigger reconnect-retry. Extends
  * IOException so existing catch-alls still see it as an IO failure.
  */
final class RespErrorException(msg: String) extends IOException(msg)

/** JVM-wide connection pool + the deployable provider binding. */
object RespRedis {

  private val pool =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Int, String, String, Int), RespRedisClient]()

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString

  /** One shared connection per (host, port, user, password, db) per JVM —
    * provider calls are per-partition, the pool keeps the socket count
    * per executor at one per endpoint. The password participates as a
    * SHA-256 digest (never plaintext in the key): two sinks at the same
    * endpoint with different credentials must NOT share one
    * authenticated session — ACL users see different keyspaces.
    */
  def clientFor(s: RedisSink): RespRedisClient = {
    require(s.mode.equalsIgnoreCase("standalone"),
      s"RESP client supports standalone mode, got '${s.mode}' " +
        "(cluster mode needs slot routing — bind a cluster-aware provider)")
    pool.computeIfAbsent(
      (s.host, s.port, s.username, sha256(s.password), s.dbNum),
      _ => new RespRedisClient(s.host, s.port, s.username, s.password, s.dbNum))
  }

  /** Bind as `RedisClients.provider = RespRedis.provider` at deploy. */
  val provider: RedisSink => RedisStringStore = clientFor

  /** Close and forget every pooled connection (tests / shutdown hooks). */
  def shutdown(): Unit = {
    val it = pool.values().iterator()
    while (it.hasNext) it.next().close()
    pool.clear()
  }
}
