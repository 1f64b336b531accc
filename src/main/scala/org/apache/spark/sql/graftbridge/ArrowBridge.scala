package org.apache.spark.sql.graftbridge

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

/** Bridge into Spark's `private[sql]` Arrow machinery (ArrowWriter /
  * ArrowUtils — the converters behind toPandas and the Arrow collect
  * path), for rendering a DRIVER-SIZED result as one complete Arrow IPC
  * stream: schema header, record batches, end-of-stream marker — the
  * byte layout any Arrow reader (pyarrow, arrow-vector, DuckDB) accepts.
  */
object ArrowBridge {

  def toArrowStream(df: DataFrame, batchSize: Int = 8192): Array[Byte] =
    // executeCollect returns the result as InternalRows (the same rows
    // Dataset.collect converts); driver-sized by this API's contract
    rowsToArrowStream(df.sparkSession, df.schema,
      df.queryExecution.executedPlan.executeCollect().iterator, batchSize)

  /** Render already-materialized InternalRows as ONE self-contained Arrow
    * IPC stream (schema header + record batches + EOS) — the shared kernel
    * behind [[toArrowStream]] and the chunked result surface
    * ([[graft.engine.GraftSession]].queryAsArrowChunks), where each CHUNK
    * is a complete stream an independent reader can parse.
    */
  def rowsToArrowStream(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rows: Iterator[InternalRow], batchSize: Int = 8192): Array[Byte] = {
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = ArrowUtils.toArrowSchema(schema, tz,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-arrow-out", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val out = new ByteArrayOutputStream()
    val stream = new ArrowStreamWriter(root, null, Channels.newChannel(out))
    try {
      val writer = ArrowWriter.create(root)
      stream.start()
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

  /** The ingest half of the bridge (reference: chdb/__init__.py:222 —
    * `Python(df)`/PyReader hands the engine an in-memory table; the
    * Arrow-native path of that surface): one complete Arrow IPC stream →
    * DataFrame. The bytes are parsed ONCE driver-side (this API's contract
    * is a driver-sized buffer handed over a language boundary — the
    * multi-GB path is parquet/file(), not an in-memory byte array), values
    * are copied out of Arrow memory into Spark rows, and the result
    * distributes like any other local relation.
    */
  def fromArrowStream(spark: org.apache.spark.sql.SparkSession,
      bytes: Array[Byte]): DataFrame = {
    val (schema, rows) = decodeArrowStream(bytes)
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val parallelism = math.max(1, math.min(rows.size,
      session.sparkContext.defaultParallelism))
    session.internalCreateDataFrame(
      session.sparkContext.parallelize(rows, parallelism), schema)
  }

  /** Decode one complete Arrow IPC stream into (schema, materialized rows).
    * EXECUTOR-SAFE — no SparkSession touched, only the Arrow jars Spark
    * ships on every node — so distributed consumers (the Arrow-framed
    * remote() fetch) can decode frames inside their partition tasks.
    * Rows are `copy()`d out of Arrow memory before the buffers are freed.
    */
  def decodeArrowStream(bytes: Array[Byte])
      : (org.apache.spark.sql.types.StructType, Seq[InternalRow]) = {
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-arrow-in", 0, Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val schema = ArrowUtils.fromArrowSchema(root.getSchema)
      val rows = new ArrayBuffer[InternalRow]()
      while (reader.loadNextBatch()) {
        val cols: Array[ColumnVector] =
          root.getFieldVectors.asScala.map(new ArrowColumnVector(_): ColumnVector).toArray
        val batch = new ColumnarBatch(cols, root.getRowCount)
        // copy() materializes each row out of the Arrow buffers — they are
        // freed when the reader closes
        batch.rowIterator().asScala.foreach(r => rows += r.copy())
      }
      (schema, rows.toSeq)
    } finally {
      reader.close()
      allocator.close()
    }
  }

  /** Assemble a DataFrame from distributed InternalRows whose layout
    * matches `schema` — the bridge the Arrow-framed remote() read uses to
    * go from executor-decoded frames to a typed DataFrame without a text
    * round trip (internalCreateDataFrame is private[sql]; this package is
    * the sanctioned doorway).
    */
  def internalRowsDF(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rows: org.apache.spark.rdd.RDD[InternalRow]): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)

  /** The RESULT-side streaming surface (reference docs/streaming.rst +
    * chdb/__init__.py:222 `send_query` → `StreamingResult`): the query's
    * rows as an iterator of SELF-CONTAINED Arrow IPC streams of
    * `rowsPerChunk` rows each, pulled lazily — `toRdd.toLocalIterator`
    * launches one Spark job per partition AS THE CONSUMER ADVANCES, so
    * driver memory holds one chunk, never the whole result. `close()`
    * cancels the iterator's job group (the reference's
    * `StreamingResult.close()`): any in-flight partition job is killed and
    * no further jobs launch. Each chunk parses independently
    * ([[fromArrowStream]] / pyarrow / DuckDB), so chunks can be shipped
    * over a language boundary one at a time — [[fromArrowBatches]]'s exact
    * inverse.
    */
  final class ArrowChunks private[graftbridge] (df: DataFrame, rowsPerChunk: Int)
      extends Iterator[Array[Byte]] with AutoCloseable {
    require(rowsPerChunk > 0, "rowsPerChunk must be positive")
    private val session = df.sparkSession
    private val sc = session.sparkContext
    val jobGroup: String = s"graft-arrow-chunks-${java.util.UUID.randomUUID()}"
    @volatile private var closed = false
    // copy EXECUTOR-side: codegen'd plans yield one reused UnsafeRow per
    // partition, and toLocalIterator collects the partition into an array
    // before shipping — without the copy every row in a partition would
    // alias the last one
    private lazy val rows: Iterator[InternalRow] =
      df.queryExecution.toRdd.map(_.copy()).toLocalIterator
    // the group is thread-local: (re)set around every pull so partition
    // jobs triggered by the iterator stay cancellable wherever consumed —
    // and RESTORED after, so a caller that set its own group before
    // iterating keeps it for its subsequent jobs
    private def withGroup[T](f: => T): T = {
      val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
      val prevDesc = sc.getLocalProperty("spark.job.description")
      val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
      sc.setJobGroup(jobGroup, "queryAsArrowChunks", interruptOnCancel = true)
      try f finally {
        sc.setLocalProperty("spark.jobGroup.id", prevGroup)
        sc.setLocalProperty("spark.job.description", prevDesc)
        sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
      }
    }
    override def hasNext: Boolean = !closed && withGroup(rows.hasNext)
    override def next(): Array[Byte] = {
      if (!hasNext) throw new NoSuchElementException("arrow chunk iterator exhausted")
      val buf = new ArrayBuffer[InternalRow](rowsPerChunk)
      withGroup {
        while (buf.length < rowsPerChunk && rows.hasNext) buf += rows.next()
      }
      rowsToArrowStream(session, df.schema, buf.iterator, rowsPerChunk)
    }
    /** Early close — kills the in-flight partition job, stops the stream. */
    override def close(): Unit = {
      closed = true
      sc.cancelJobGroup(jobGroup)
    }
  }

  def arrowChunks(df: DataFrame, rowsPerChunk: Int = 8192): ArrowChunks =
    new ArrowChunks(df, rowsPerChunk)

  // spool dirs awaiting JVM-exit cleanup; one shutdown hook for all calls
  private val spoolDirs = new java.util.concurrent.ConcurrentLinkedQueue[
    (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path)]()
  private lazy val installCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      spoolDirs.forEach(t =>
        try t._1.delete(t._2, true) catch { case _: Throwable => () })))

  /** The CHUNKED ingest half — the reference PyReader's pull contract
    * (chdb/__init__.py:222: `read(col_names, count)` is called repeatedly
    * until it returns empty; README.md:430-460): an iterator of complete
    * Arrow IPC streams is drained one chunk at a time, each chunk spooled
    * to a parquet append as soon as it is parsed, so DRIVER MEMORY IS
    * BOUNDED BY ONE CHUNK — ingest size is bounded by disk, not by a
    * single in-memory byte buffer (the [[fromArrowStream]] contract).
    * Chunks after the first must match the first chunk's schema exactly.
    * The spool directory is resolved against the CLUSTER-VISIBLE
    * filesystem: java.io.tmpdir is only valid on a local master (executors
    * share the driver's disk); on any other master it goes under the
    * warehouse dir's filesystem, which every executor can reach. All spool
    * dirs are deleted by a JVM shutdown hook (one hook, every call's dir).
    */
  def fromArrowBatches(spark: org.apache.spark.sql.SparkSession,
      chunks: Iterator[Array[Byte]]): DataFrame = {
    if (!chunks.hasNext) return spark.emptyDataFrame
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dir: org.apache.hadoop.fs.Path =
      if (spark.sparkContext.isLocal)
        new org.apache.hadoop.fs.Path("file:" +
          java.nio.file.Files.createTempDirectory("graft-arrow-ingest"))
      else {
        // shared storage all executors write to (HDFS/S3/... in cluster mode)
        val p = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"),
          s"_graft_arrow_ingest_${java.util.UUID.randomUUID()}")
        p.getFileSystem(hadoopConf).mkdirs(p)
        p
      }
    installCleanupHook
    spoolDirs.add((dir.getFileSystem(hadoopConf), dir))
    var schema: org.apache.spark.sql.types.StructType = null
    var i = 0
    while (chunks.hasNext) {
      val df = fromArrowStream(spark, chunks.next())
      if (schema == null) schema = df.schema
      else require(df.schema == schema,
        s"arrow chunk $i schema ${df.schema.toDDL} != first chunk's ${schema.toDDL}")
      df.write.mode("append").parquet(dir.toString)
      i += 1
    }
    spark.read.schema(schema).parquet(dir.toString)
  }
}
