package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Log-driven [[FileIndex]] for the native Delta reader — the Spark-native
  * integration point that lets Catalyst plan ONE parquet scan over the
  * snapshot's file list (the connector's TahoeFileIndex uses the same
  * seam). What it buys at scale, all at plan/driver time with zero data
  * reads:
  *
  *   - **Partition pruning from the log.** Delta data files do NOT contain
  *     partition columns; their values live in the log's partitionValues.
  *     Each distinct partition tuple becomes one [[PartitionDirectory]]
  *     whose values are cast from the log's string serialization, and
  *     Catalyst's pushed partition filters prune directories here — a
  *     filter hitting 1 of 10k partitions lists 1/10k of the files, and
  *     the plan shows it under `PartitionFilters`.
  *   - **Stats-based file skipping.** Pushed data filters are evaluated
  *     conservatively against each add action's per-file min/max/nullCount
  *     stats (written by [[DeltaNative.write]], carried through
  *     checkpoints), so a point lookup on a clustered column opens a
  *     handful of files out of millions. Unknown predicates or absent
  *     stats keep the file — skipping can only drop files PROVEN to hold
  *     no matching row.
  *   - **Proper file splitting.** One scan node means
  *     `spark.sql.files.maxPartitionBytes` splitting, vectorized parquet
  *     reading, AQE and runtime filters all apply exactly as for a plain
  *     `spark.read.parquet`, instead of one scan per partition tuple
  *     (the previous union-of-scans shape).
  */
class DeltaFileIndex(spark: SparkSession, tablePath: String,
    snap: DeltaNative.Snapshot) extends FileIndex {

  override val partitionSchema: StructType =
    StructType(snap.partitionColumns.map(c => snap.schema(c)))

  private val zone = Option(spark.sessionState.conf.sessionLocalTimeZone)

  protected def absPath(p: String): Path = {
    val d = DeltaNative.decodePath(p)
    if (d.contains("://") || d.startsWith("/")) new Path(d)
    else new Path(new Path(tablePath), d)
  }

  private val dataSchema: StructType = StructType(
    snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))

  // one directory per distinct partition tuple, with the snapshot AddFiles
  // kept alongside so data-filter skipping can consult their stats
  private val dirs: Seq[(InternalRow, Seq[DeltaNative.AddFile])] =
    snap.files.groupBy(_.partitionValues).toSeq.map { case (pv, fsq) =>
      val values = partitionSchema.map { f =>
        pv.getOrElse(f.name, None) match {
          case Some(s) =>
            Cast(Literal(UTF8String.fromString(s), StringType), f.dataType,
              zone).eval(null)
          case None => null
        }
      }
      (InternalRow.fromSeq(values), fsq)
    }

  private def status(f: DeltaNative.AddFile): FileStatus =
    new FileStatus(f.size, false, 1, 128L * 1024 * 1024, 0L, absPath(f.path))

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
      else {
        val resolver = spark.sessionState.conf.resolver
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = partitionSchema.indexWhere(f => resolver(f.name, a.name))
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
        dirs.filter { case (row, _) => bound.eval(row) }
      }
    val skipper = DeltaStats.skipper(dataSchema, dataFilters, zone)
    selected.map { case (row, files) =>
      PartitionDirectory(row, files.filter(skipper).map(status).toArray)
    }
  }

  override def inputFiles: Array[String] =
    snap.files.map(f => absPath(f.path).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = snap.files.map(_.size).sum
}

/** The same seam for the native Hudi CoW reader. Hudi data files carry
  * COMPLETE rows (partition columns included), so partitionSchema stays
  * empty and every filter arrives as a data filter — but each file's hive
  * partition path pins its partition columns exactly, which
  * [[HudiNative]] encodes as per-file min=max stats. The inherited
  * stats skipper then prunes partition-filtered files at plan time
  * without opening a single footer. Paths come straight from a
  * FileSystem listing, so no URI decoding applies.
  */
final class HudiFileIndex(spark: SparkSession, tablePath: String,
    snap: DeltaNative.Snapshot) extends DeltaFileIndex(spark, tablePath, snap) {
  override protected def absPath(p: String): Path = new Path(p)
}

/** And for the native Iceberg reader: complete-row data files (empty
  * partition schema), with the manifest's per-file lower/upper_bounds and
  * null_value_counts decoded by [[IcebergNative]] into the same stats
  * JSON — manifest metadata alone prunes the file list at plan time.
  * Paths are pre-resolved absolute filesystem paths.
  */
final class IcebergFileIndex(spark: SparkSession, tablePath: String,
    snap: DeltaNative.Snapshot) extends DeltaFileIndex(spark, tablePath, snap) {
  override protected def absPath(p: String): Path = new Path(p)
}
