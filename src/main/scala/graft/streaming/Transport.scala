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
