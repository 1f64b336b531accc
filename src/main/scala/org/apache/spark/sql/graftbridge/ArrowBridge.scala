package org.apache.spark.sql.graftbridge

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.util.ArrowUtils

/** Bridge into Spark's `private[sql]` Arrow machinery (ArrowWriter /
  * ArrowUtils — the converters behind toPandas and the Arrow collect
  * path), for rendering a DRIVER-SIZED result as one complete Arrow IPC
  * stream: schema header, record batches, end-of-stream marker — the
  * byte layout any Arrow reader (pyarrow, arrow-vector, DuckDB) accepts.
  */
object ArrowBridge {

  def toArrowStream(df: DataFrame, batchSize: Int = 8192): Array[Byte] = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = ArrowUtils.toArrowSchema(df.schema, tz,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-arrow-out", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val out = new ByteArrayOutputStream()
    val stream = new ArrowStreamWriter(root, null, Channels.newChannel(out))
    try {
      val writer = ArrowWriter.create(root)
      stream.start()
      // executeCollect returns the result as InternalRows (the same rows
      // Dataset.collect converts); driver-sized by this API's contract
      val rows = df.queryExecution.executedPlan.executeCollect().iterator
      while (rows.hasNext) {
        var n = 0
        while (rows.hasNext && n < batchSize) { writer.write(rows.next()); n += 1 }
        writer.finish()
        stream.writeBatch()
        writer.reset()
      }
      stream.end()
    } finally {
      stream.close()
      root.close()
      allocator.close()
    }
    out.toByteArray
  }
}
