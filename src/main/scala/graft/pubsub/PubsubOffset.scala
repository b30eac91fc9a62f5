package graft.pubsub

import org.apache.spark.sql.connector.read.streaming.Offset

/** Logical batch-counter offset: offsets number micro-batches, they are
  * not positions in the stream (the broker tracks delivery state via acks;
  * reference: PubsubMicroBatchStream.scala:23,33-38, README.md:125).
  * Public-API replacement for the internal LongOffset the reference used.
  */
final case class PubsubOffset(batchId: Long) extends Offset {
  override def json(): String = batchId.toString
}
