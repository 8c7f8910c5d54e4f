package graft.client

import graft.table.RedisSink

/** Pluggable Redis string-command client — the seam a Jedis/Lettuce client
  * fills at deploy (the reference talks to Redis through Flink's connector;
  * here the engine only needs GET/SET of string keys). Implementations must
  * be usable from executor code: a real client connects per partition, the
  * in-process [[MemoryRedis]] works in local mode.
  */
trait RedisStringStore extends Serializable {
  def put(key: String, value: String): Unit
  def get(key: String): Option[String]
}

/** In-process stand-in for a Redis instance (tests / local serving). */
object MemoryRedis extends RedisStringStore {
  private val data = new java.util.concurrent.ConcurrentHashMap[String, String]()
  override def put(key: String, value: String): Unit = data.put(key, value)
  override def get(key: String): Option[String] = Option(data.get(key))
  def clear(): Unit = data.clear()
  def size: Int = data.size
}

/** Deploy-time client selection: swap the provider to route [[graft.table
  * .RedisSink]]/[[graft.table.RedisSource]] traffic to a real cluster —
  * `RedisClients.provider = RespRedis.provider` binds the shipped
  * socket-level RESP2 client ([[RespRedisClient]], pooled per executor
  * JVM); the default stays the in-process [[MemoryRedis]] for local mode.
  */
object RedisClients {
  @volatile var provider: RedisSink => RedisStringStore = _ => MemoryRedis

  /** Client for a source: connection fields mirror the sink's. */
  def forSource(s: graft.table.RedisSource): RedisStringStore =
    provider(RedisSink(
      s.host, s.port, s.mode, s.username, s.password, s.dbNum, s.namespace, s.keyExpr))
}
