package graft.client

import graft.engine.Registry
import graft.table.{Json, TableDescriptor}

import java.sql.{Connection, DriverManager, Timestamp}

/** Database-backed registry — the reference's MySqlRegistry generalized to
  * any JDBC URL (ref: python/feathub/registries/mysql_registry.py:64-280;
  * Derby/MySQL/Postgres all speak the same four statements here).
  *
  * Rows are (name, timestamp, digest, descriptor JSON); `register` is
  * idempotent on the sha-256 digest and refuses to clobber a newer row
  * (mysql_registry.py:185-205), `get` serves the process-local cache first
  * and falls back to the newest database row, and every load also
  * registers into the in-process [[graft.engine.Registry]] so engine
  * builds and string references resolve against it.
  *
  * Deviation from the reference: one descriptor column instead of
  * original+resolved — graft descriptors are constructed resolved
  * (UnresolvedDerivedFeatureView.build() runs before registration), so the
  * pair would always coincide. Statements are parameterized rather than
  * string-interpolated.
  */
final class JdbcRegistry(
    url: String,
    table: String = "graft_registry",
    user: String = "",
    password: String = "") extends AutoCloseable {

  private val conn: Connection =
    if (user.nonEmpty) DriverManager.getConnection(url, user, password)
    else DriverManager.getConnection(url)

  locally {
    val st = conn.createStatement()
    try st.executeUpdate(
      s"""CREATE TABLE $table (
          name VARCHAR(64) NOT NULL,
          ts TIMESTAMP NOT NULL,
          digest VARCHAR(64) NOT NULL,
          descriptor CLOB NOT NULL,
          PRIMARY KEY (name, ts))""")
    catch {
      // Derby has no CREATE TABLE IF NOT EXISTS; X0Y32 = already exists.
      // MySQL/Postgres raise vendor equivalents with the same meaning.
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" ||
        e.getMessage.toLowerCase.contains("already exists") => ()
    } finally st.close()
  }

  private val cache =
    scala.collection.mutable.Map.empty[String, (TableDescriptor, String, Timestamp)]

  private def digestOf(json: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(json.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Persist a descriptor; returns false when the stored digest is already
    * current or a newer row exists (mysql_registry.py:185-205). Also
    * registers into the in-process registry.
    */
  def register(desc: TableDescriptor): Boolean = {
    require(desc.name.nonEmpty, "cannot register a descriptor with an empty name")
    require(desc.name.length <= 64,
      "cannot register a descriptor with a name longer than 64 characters")
    Registry.register(desc)
    val json = Json.toJson(desc)
    val digest = digestOf(json)
    val stored = latestRow(desc.name)
    // two registers within one millisecond must not collide on the
    // (name, ts) primary key — bump past the stored row's timestamp
    val now = new Timestamp(
      math.max(System.currentTimeMillis(),
        stored.map(_._1.getTime + 1).getOrElse(Long.MinValue)))
    cache(desc.name) = (desc, digest, now)
    stored match {
      case Some((_, storedDigest, _)) if storedDigest == digest =>
        false
      case _ =>
        val ps = conn.prepareStatement(
          s"INSERT INTO $table (name, ts, digest, descriptor) VALUES (?, ?, ?, ?)")
        try {
          ps.setString(1, desc.name)
          ps.setTimestamp(2, now)
          ps.setString(3, digest)
          ps.setString(4, json)
          ps.executeUpdate()
          true
        } finally ps.close()
    }
  }

  /** Local cache first, then the newest database row; `forceUpdate` skips
    * the cache (mysql_registry.py:227-247). The loaded descriptor is also
    * registered in-process.
    */
  def get(name: String, forceUpdate: Boolean = false): TableDescriptor = {
    if (!forceUpdate) {
      cache.get(name).foreach { case (d, _, _) => return d }
    }
    val (ts, digest, json) = latestRow(name).getOrElse(
      throw new NoSuchElementException(s"Table $name is not in the registry"))
    val desc = Json.fromJson(json)
    cache(name) = (desc, digest, ts)
    Registry.register(desc)
    desc
  }

  /** Delete every stored row for `name` (and the caches); false when the
    * registry had no such table (ref: mysql_registry delete path /
    * test_registry.py:158-186).
    */
  def delete(name: String): Boolean = {
    cache.remove(name)
    Registry.delete(name)
    val ps = conn.prepareStatement(s"DELETE FROM $table WHERE name = ?")
    try {
      ps.setString(1, name)
      ps.executeUpdate() > 0
    } finally ps.close()
  }

  private def latestRow(name: String): Option[(Timestamp, String, String)] = {
    val ps = conn.prepareStatement(
      s"SELECT ts, digest, descriptor FROM $table WHERE name = ? ORDER BY ts DESC")
    try {
      ps.setString(1, name)
      val rs = ps.executeQuery()
      try {
        if (rs.next()) Some((rs.getTimestamp(1), rs.getString(2), rs.getString(3)))
        else None
      } finally rs.close()
    } finally ps.close()
  }

  override def close(): Unit = conn.close()
}
