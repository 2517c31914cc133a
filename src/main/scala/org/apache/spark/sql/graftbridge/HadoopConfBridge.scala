package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Connector-namespace seam for Spark's `private[spark]`
  * [[SerializableConfiguration]] — the standard way every bundled Spark
  * data source ships the driver's Hadoop configuration (object-store
  * credentials, endpoints, FS tuning) into executor tasks. Hadoop
  * `Configuration` is not `java.io.Serializable`; building a fresh
  * default one inside a task silently drops s3a auth on any
  * authenticated filesystem, so the sources that range-read files from
  * tasks ([[graft.sources.OsmPbf.readSplit]], the
  * [[graft.sources.GeoParquet.write]] footer-stamp fan-out) broadcast
  * through this instead. The wrapper keeps the private[spark] type out
  * of caller signatures.
  */
object HadoopConfBridge {

  /** Opaque serializable handle a task unwraps with [[ConfBox.conf]]. */
  final class ConfBox private[graftbridge] (
      private val b: Broadcast[SerializableConfiguration]) extends Serializable {
    def conf: Configuration = b.value.value
  }

  /** Broadcast the driver's current Hadoop conf once per job. */
  def broadcast(sc: SparkContext): ConfBox =
    new ConfBox(SerializableConfiguration.broadcast(sc))
}
