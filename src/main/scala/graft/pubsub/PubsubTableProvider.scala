package graft.pubsub

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.streaming.StreamingWrite
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Registers the `pubsub` short name and builds the streaming table.
  *
  * All-public DSv2 surface (reference used the internal
  * SimpleTableProvider + V1 StreamSinkProvider,
  * PubsubTableProvider.scala:12-31; see SURVEY.md §7.1 for why we use
  * TableProvider + SupportsWrite/STREAMING_WRITE instead).
  */
class PubsubTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pubsub"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PubsubOptions.ReadSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PubsubTable(properties.asScala.toMap)
}

/** Fixed-schema streaming table: micro-batch readable, streaming
  * writable (append-only — no SupportsTruncate, so Complete/Update output
  * modes are rejected by Spark; reference enforced Append at
  * PubsubTableProvider.scala:24-25). */
class PubsubTable(properties: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = "PubsubTable"
  override def schema(): StructType = PubsubOptions.ReadSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE,
      // The sink accepts any schema containing (data, attributes[, key]);
      // validation happens in PubsubWriteBuilder.
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Merge table properties under scan options (scan options win), the
    // same merge the reference does at PubsubTable.scala:24-28.
    val merged = properties ++ options.asScala
    new PubsubScanBuilder(PubsubOptions.readOptions(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = properties ++ info.options().asScala
    new PubsubWriteBuilder(PubsubOptions.writeOptions(merged), info)
  }
}

class PubsubScanBuilder(opts: PubsubReadOptions) extends ScanBuilder {
  override def build(): Scan = new PubsubScan(opts)
}

/** Row-oriented scan (columnar unsupported, as in the reference:
  * PubsubScan.scala:13). */
class PubsubScan(opts: PubsubReadOptions) extends Scan {
  override def readSchema(): StructType = PubsubOptions.ReadSchema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PubsubMicroBatchStream(opts, checkpointLocation)
  override def description(): String =
    s"PubsubScan(${opts.subscriptionPath})"
}
