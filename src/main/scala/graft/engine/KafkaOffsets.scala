package graft.engine

/** Committed-offset resolution for Kafka `startup_mode=group-offsets` —
  * the reference's DEFAULT startup mode (ref: python/feathub/
  * feature_tables/sources/kafka_source.py:42,76-79, mapped on Flink to
  * `scan.startup.mode=group-offsets`). Spark's Kafka source has no native
  * committed-offset resume, but the semantics are faithfully reproduced by
  * fetching the group's committed offsets ONCE at plan time and handing
  * them to Spark as `startingOffsets` offsets-JSON — identical behavior
  * for both the batch and streaming readers.
  *
  * The fetch itself is a pluggable [[KafkaOffsets.Provider]] seam:
  * production uses the default provider (Kafka `AdminClient`, loaded
  * reflectively so this library has no hard kafka-clients dependency —
  * the jar rides in with the spark-sql-kafka connector that any real
  * Kafka deployment already has); tests install an in-process fixture.
  *
  * Partitions with NO committed offset resolve to -2 (earliest), matching
  * the Kafka consumer's default `auto.offset.reset=earliest` fallback the
  * reference relies on when a group is new.
  */
object KafkaOffsets {

  /** (bootstrapServers, consumerGroup, topic) => offset per partition,
    * covering EVERY partition of the topic (Spark rejects offsets-JSON
    * that omits a partition); -2 = earliest, -1 = latest.
    */
  type Provider = (String, String, String) => Map[Int, Long]

  @volatile private var provider: Provider = adminClientProvider

  /** Install a custom provider (test fixture / alternative client);
    * returns the previous one so callers can restore it.
    */
  def setProvider(p: Provider): Provider = {
    val prev = provider; provider = p; prev
  }

  /** The `startingOffsets` JSON for a group's committed position, e.g.
    * `{"clicks":{"0":42,"1":-2}}`.
    */
  def startingOffsetsJson(bootstrap: String, group: String, topic: String): String = {
    val offsets = provider(bootstrap, group, topic)
    require(offsets.nonEmpty, s"topic $topic has no partitions (group $group)")
    val parts = offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString(",")
    s"""{"$topic":{$parts}}"""
  }

  /** Default provider: Kafka AdminClient via reflection — partition count
    * from `describeTopics`, committed positions from
    * `listConsumerGroupOffsets`, uncommitted partitions filled with -2.
    */
  private def adminClientProvider: Provider = (bootstrap, group, topic) => {
    val cls =
      try Class.forName("org.apache.kafka.clients.admin.AdminClient")
      catch {
        case _: ClassNotFoundException =>
          throw new IllegalStateException(
            "startup_mode=group-offsets fetches the group's committed offsets " +
              "with the Kafka AdminClient, but kafka-clients is not on the " +
              "classpath. Add the spark-sql-kafka connector jars (any Kafka " +
              "deployment has them) or install a custom KafkaOffsets.setProvider.")
      }
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    val admin = cls.getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
    def call(target: AnyRef, method: String, args: (Class[_], AnyRef)*): AnyRef =
      target.getClass.getMethod(method, args.map(_._1): _*)
        .invoke(target, args.map(_._2): _*)
    try {
      // partition count: describeTopics(Collection[String]).allTopicNames().get()
      val described = call(
        call(admin, "describeTopics",
          classOf[java.util.Collection[_]] -> java.util.Arrays.asList(topic)),
        "allTopicNames")
      val topicDesc = call(described, "get")
        .asInstanceOf[java.util.Map[String, AnyRef]].get(topic)
      val nParts = call(topicDesc, "partitions")
        .asInstanceOf[java.util.List[_]].size()
      // committed: listConsumerGroupOffsets(group).partitionsToOffsetAndMetadata().get()
      val committedFut = call(
        call(admin, "listConsumerGroupOffsets", classOf[String] -> group),
        "partitionsToOffsetAndMetadata")
      val committed = call(committedFut, "get")
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      val byPartition = new scala.collection.mutable.HashMap[Int, Long]
      committed.forEach { (tp, oam) =>
        if (call(tp, "topic").asInstanceOf[String] == topic && oam != null)
          byPartition(call(tp, "partition").asInstanceOf[Integer].intValue()) =
            call(oam, "offset").asInstanceOf[java.lang.Long].longValue()
      }
      (0 until nParts).map(p => p -> byPartition.getOrElse(p, -2L)).toMap
    } finally call(admin, "close")
  }
}
