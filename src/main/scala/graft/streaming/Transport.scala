package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Wire-transport abstraction for the feature stream (SURVEY.md §2 A4/A5:
  * the reference's Kafka producer/consumer wrappers [UPSTREAM-UNVERIFIED —
  * reference checkout empty, SURVEY.md §0]).
  *
  * A production deployment binds `spark.readStream.format("kafka")` /
  * `writeStream.format("kafka")` here; this image ships no Kafka connector
  * jar (verified in SURVEY.md §2 A4), so the offline implementations are:
  *
  *  - [[FileTransport]] — a parquet directory of packed feature bytes;
  *    file-source streaming has the same offset/checkpoint semantics as a
  *    Kafka topic (files ≙ segments, file position ≙ offset).
  *  - `MemoryStream` in tests (see StreamingSpec), which exercises the
  *    identical downstream pipeline.
  *
  * Everything downstream of [[Transport.read]] is transport-agnostic: one
  * column `value: BinaryType` per message, exactly the Kafka `value` shape.
  */
trait Transport {
  /** Streaming frame with a single `value: BinaryType` column. */
  def read(spark: SparkSession): DataFrame
}

/** Parquet-directory transport: the offline stand-in for a Kafka topic.
  * `produce` is the A5 sink side (batch append ≙ producer publish).
  */
final class FileTransport(dir: String) extends Transport {
  private val schema = StructType(Seq(StructField("value", BinaryType)))

  override def read(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Publish packed feature bytes (batch side — producer emulation). */
  def produce(wire: DataFrame): Unit =
    wire.select(wire.col("value").cast(BinaryType)).write.mode("append").parquet(dir)
}

/** The real Kafka binding (A4/A5) — COMPILE-READY and wired, but this
  * image ships no `spark-sql-kafka` connector jar (verified in SURVEY.md
  * §2 A4), so constructing the stream fails at runtime with Spark's
  * data-source-lookup error until a deployment adds the jar. The seam
  * exists so switching a pipeline from [[FileTransport]] to Kafka is a
  * constructor swap, not a rewrite: downstream of [[read]] both produce
  * the identical one-column `value: BinaryType` frame (Kafka's own
  * `value` column, cast). TransportSpec pins the failure mode so a
  * future image WITH the jar flips the test rather than silently
  * changing behavior.
  */
final class KafkaTransport(bootstrapServers: String, topic: String,
    startingOffsets: String = "earliest") extends Transport {

  override def read(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(org.apache.spark.sql.functions.col("value").cast(BinaryType))

  /** Streaming sink side (A5): packed feature bytes → the topic. */
  def produce(wire: DataFrame, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    wire.select(org.apache.spark.sql.functions.col("value").cast(BinaryType))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()
}
