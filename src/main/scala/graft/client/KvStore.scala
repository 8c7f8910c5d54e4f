package graft.client

/** One requested field of a KV lookup. `entryKeys = Some(ks)` restricts a
  * map-typed field to those entries — the static map-entry pushdown: when a
  * lookup join only uses `m['k']`-style literal subscripts of a map
  * feature, the store fetches just those hash entries instead of the whole
  * map (ref: python/feathub/processors/flink/table_builder/
  * redis_utils.py:109-167; docs/content/deep-dive/optimizations.md §3).
  */
final case class FieldRequest(field: String, entryKeys: Option[Seq[String]] = None)

/** Pluggable KV store behind lookup joins — the seam where a Redis/HBase
  * client would plug in (the reference's RedisSource lookup path);
  * [[MemoryKvStore]] is the in-process implementation used in tests and
  * local serving.
  */
trait KvStore {
  /** Key fields the table was registered with. */
  def keyFields(table: String): Seq[String]

  /** Latest-per-key snapshot rows with the request's projection applied:
    * only the requested fields are present, and map-typed fields with
    * `entryKeys` set carry ONLY those entries — a real Redis impl issues
    * HMGET for exactly those hash fields.
    */
  def fetch(table: String, request: Seq[FieldRequest]): Seq[Map[String, Any]]
}

/** [[KvStore]] over [[MemoryOnlineStore]], standing in for Redis. Records
  * the last request per table so tests can assert what was pushed down.
  */
object MemoryKvStore extends KvStore {

  @volatile private var requests: Map[String, Seq[FieldRequest]] = Map.empty

  /** The last fetch request issued against `table` (for pushdown specs). */
  def lastRequest(table: String): Option[Seq[FieldRequest]] = requests.get(table)

  override def keyFields(table: String): Seq[String] =
    MemoryOnlineStore.keyFieldsOf(table)

  override def fetch(table: String, request: Seq[FieldRequest]): Seq[Map[String, Any]] = {
    synchronized { requests += table -> request }
    MemoryOnlineStore.snapshotRows(table).map { row =>
      request.flatMap { fr =>
        row.get(fr.field).map { v =>
          val projected = (v, fr.entryKeys) match {
            case (m: Map[_, _], Some(ks)) =>
              m.asInstanceOf[Map[Any, Any]]
                .filter { case (k, _) => ks.contains(String.valueOf(k)) }
            case _ => v
          }
          fr.field -> projected
        }
      }.toMap
    }
  }
}
