package graft.table

/** Bounded-view conversion of a descriptor TREE — parity with the
  * reference's `TableDescriptor.get_bounded_view()` /`is_bounded()`
  * (python/feathub/table/table_descriptor.py:126-140,
  * feature_views/feature_view.py:211-220, feature_tables/sources/
  * kafka_source.py:134-142, datagen_source.py:190-199): a feature-view
  * chain declared over streaming sources re-runs in batch — backfills,
  * tests, one-shot audits — by swapping every unbounded LEAF for its
  * bounded twin, recursively, without the user hand-`copy()`ing each
  * level of the tree.
  *
  * Semantics per node, matching the reference's overrides:
  *  - a bounded tree returns `this` (no copies);
  *  - [[FileSource]] / [[KafkaSource]] flip `isBounded = true` (Kafka's
  *    bounded mode is the batch Kafka reader, kafka_source.py:137-142);
  *  - [[DataGenSource]] drops unbounded rate mode for its
  *    `numberOfRows`-bounded form (datagen_source.py:193-199);
  *  - views ([[DerivedFeatureView]], [[SlidingFeatureView]]) copy with a
  *    bounded source (feature_view.py:214-220);
  *  - an unbounded [[SqlFeatureView]] (streaming dependency) and a
  *    streaming [[DataFrameSource]] REFUSE loudly — the reference raises
  *    for SqlFeatureView (sql_feature_view.py:131-136) because the SQL
  *    text may not be batch-safe, and a pre-built streaming DataFrame
  *    has no batch twin to copy;
  *  - store scans (Hive/JDBC/Redis/MemoryStore) and [[OnDemandFeatureView]]
  *    are snapshot reads, bounded by construction (feature_table.py:121).
  */
object Bounded {

  /** Whether the whole descriptor tree is bounded (reference
    * `is_bounded()`: a view is bounded iff its resolved source is).
    */
  def isBounded(d: TableDescriptor): Boolean = d match {
    case f: FileSource          => f.isBounded
    case k: KafkaSource         => k.isBounded
    case g: DataGenSource       => !g.unbounded
    case s: DataFrameSource     => !s.df.isStreaming
    case v: DerivedFeatureView  => isBounded(v.source)
    case v: SlidingFeatureView  => isBounded(v.source)
    case v: SqlFeatureView      => v.dependencies.forall(isBounded)
    case _                      => true // snapshot store scans / on-demand
  }

  /** The bounded twin of the tree: `d` itself when already bounded,
    * otherwise a copy with every unbounded leaf converted.
    */
  def boundedView(d: TableDescriptor): TableDescriptor =
    if (isBounded(d)) d
    else d match {
      case f: FileSource    => f.copy(isBounded = true)
      case k: KafkaSource   => k.copy(isBounded = true)
      case g: DataGenSource => g.copy(unbounded = false)
      case v: DerivedFeatureView => v.copy(source = boundedView(v.source))
      case v: SlidingFeatureView => v.copy(source = boundedView(v.source))
      case v: SqlFeatureView =>
        throw new IllegalArgumentException(
          s"SqlFeatureView ${v.name} is unbounded and has no bounded view " +
            "(the SQL text may not be batch-safe); bound its dependencies " +
            "and declare a new view")
      case s: DataFrameSource =>
        throw new IllegalArgumentException(
          s"DataFrameSource ${s.name} wraps a streaming DataFrame — there " +
            "is no batch twin to copy; wrap the batch frame instead")
      case other => other
    }
}
