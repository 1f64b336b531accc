package graft.io

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native Apache Hudi COPY_ON_WRITE reader — a from-scratch implementation
  * of the public Hudi storage spec (hudi.apache.org/tech-specs: timeline +
  * base-file naming), used by [[Sources.hudi]] when no connector jar is on
  * the classpath (reference `hudi()`: datastore/table_functions.py:975 —
  * read-only path scan; ClickHouse's Hudi engine is the same
  * listing-driven CoW snapshot read).
  *
  * Snapshot semantics: a CoW table is a set of FILE GROUPS (`fileId`); each
  * commit rewrites a group as a new base file named
  * `<fileId>_<writeToken>_<instantTime>.parquet`. The snapshot is, per
  * group, the newest base file whose instant is a COMPLETED commit on the
  * timeline (`.hoodie/<ts>.commit` / `<ts>.replacecommit`) — uncommitted
  * (inflight/failed) files are naturally excluded because their instant
  * never completes. `replacecommit` additionally retires whole groups
  * (clustering / insert_overwrite) via `partitionToReplaceFileIds`.
  *
  * Only the timeline (KBs of JSON) is read on the driver; the selected base
  * files feed a plain distributed `spark.read.parquet`, so pushdown /
  * pruning / AQE apply as usual. CoW data files carry ALL columns
  * (partition fields included, plus the `_hoodie_*` meta columns), so no
  * per-file value attachment is needed.
  *
  * MERGE_ON_READ (r10): a MOR file group is a base file plus LOG FILES of
  * Avro data/delete blocks ([[HudiLog]], from the public log-format spec);
  * the snapshot is base rows merged with the latest log record per
  * `_hoodie_record_key`. The merge is Spark-first: log files parse on
  * EXECUTORS into a DataFrame (bytes proportional to un-compacted
  * updates), the latest-per-key winner comes from one hash aggregation on
  * the record key, and base rows are subtracted with an anti-join — at
  * 100 TB the shuffled volume is the log delta (bounded by compaction),
  * never the base data, and nothing materializes on the driver.
  * [[upsert]] / [[deleteWhere]] write log blocks routed to each key's
  * file group (zero base files rewritten — the whole point of MOR).
  *
  * Unsupported-by-design (capability error, never wrong rows):
  * `drop.partition.columns=true` tables, timeline-layout v2 (1.x
  * `.hoodie/timeline/` dir — detected and named in the error), MOR
  * incremental reads (full-refresh instead), nested columns in log
  * payloads.
  */
object HudiNative {

  private val mapper = new ObjectMapper()

  private val baseFileRe = "^([^_]+)_([^_]+)_([0-9]+)\\.parquet$".r
  // .{fileId}_{baseInstant}.log.{version}_{writeToken}
  private val logFileRe = "^\\.(.+)_([0-9]+)\\.log\\.([0-9]+)_(.+)$".r

  final case class BaseFile(partition: String, fileId: String, instant: String,
      path: String, size: Long = 0L)

  final case class LogFile(partition: String, fileId: String,
      baseInstant: String, version: Int, path: String)

  /** Parse `.hoodie/hoodie.properties` (java.util.Properties format). */
  def tableProperties(spark: SparkSession, tablePath: String): Map[String, String] = {
    val p = new Path(tablePath, ".hoodie/hoodie.properties")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      throw new IllegalArgumentException(
        s"not a Hudi table (no .hoodie/hoodie.properties): $tablePath")
    val in = fs.open(p)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    props.asScala.toMap
  }

  /** The active base files of the latest completed snapshot. */
  def snapshotFiles(spark: SparkSession, tablePath: String): Seq[BaseFile] = {
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    val props = tableProperties(spark, tablePath)

    props.get("hoodie.table.type").foreach { t =>
      if (t.equalsIgnoreCase("MERGE_ON_READ"))
        throw unsupported("MERGE_ON_READ (log-file merge)", tablePath)
    }
    props.get("hoodie.datasource.write.drop.partition.columns")
      .filter(_.equalsIgnoreCase("true"))
      .foreach(_ => throw unsupported("drop.partition.columns=true", tablePath))
    if (fs.exists(new Path(table, ".hoodie/timeline")))
      throw unsupported("timeline layout v2 (.hoodie/timeline/)", tablePath)

    // completed instants + group retirements from the timeline
    val hoodie = new Path(table, ".hoodie")
    val timeline = fs.listStatus(hoodie).filter(_.isFile).map(_.getPath.getName)
    val commitRe = "^([0-9]+)\\.(commit|replacecommit)$".r
    val completed = mutable.Map.empty[String, String] // instant -> action
    timeline.foreach {
      case commitRe(ts, action) => completed(ts) = action
      case n if n.matches("^[0-9]+\\.deltacommit.*") =>
        throw unsupported("MERGE_ON_READ (deltacommit on timeline)", tablePath)
      case _ => ()
    }
    if (completed.isEmpty) return Nil

    val replaced = mutable.Map.empty[String, String] // fileId -> replace instant
    completed.collect { case (ts, "replacecommit") => ts }.foreach { ts =>
      val p = new Path(hoodie, s"$ts.replacecommit")
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val node = mapper.readTree(text)
      Option(node.get("partitionToReplaceFileIds")).foreach { byPart =>
        val parts = byPart.fields()
        while (parts.hasNext) {
          val ids = parts.next().getValue
          (0 until ids.size).map(ids.get(_).asText).foreach { id =>
            if (replaced.get(id).forall(_ < ts)) replaced(id) = ts
          }
        }
      }
    }

    // listing-driven file-slice selection (the data files ARE the index for
    // CoW; the optional .hoodie/metadata table is an optimization we skip)
    val found = mutable.Buffer.empty[BaseFile]
    val it = fs.listFiles(table, true)
    val tableUri = table.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val st = it.next()
      val full = st.getPath.toUri.getPath
      val rel = full.stripPrefix(tableUri).stripPrefix("/")
      if (!rel.startsWith(".hoodie/") && !rel.startsWith(".")) {
        if (rel.endsWith(".log") || rel.contains(".log."))
          throw unsupported("MERGE_ON_READ (log files present)", tablePath)
        val name = st.getPath.getName
        name match {
          case baseFileRe(fileId, _, instant) if completed.contains(instant) =>
            val partition = rel.stripSuffix("/" + name) match {
              case `rel` => "" // file at table root: unpartitioned
              case d => d
            }
            if (!replaced.get(fileId).exists(_ >= instant))
              found += BaseFile(partition, fileId, instant,
                st.getPath.toString, st.getLen)
          case _ => () // non-base or uncommitted file: skip
        }
      }
    }
    // newest completed base file per (partition, fileId) group
    found.groupBy(f => (f.partition, f.fileId)).values
      .map(_.maxBy(_.instant)).toSeq.sortBy(_.path)
  }

  /** Read the latest CoW snapshot as a DataFrame. `withMeta = false` drops
    * the `_hoodie_*` meta columns (the default user-facing shape).
    *
    * Served through [[HudiFileIndex]]: Hudi data files carry complete rows
    * (partition columns included), so the relation has no partition
    * schema, but each file's hive partition path pins its partition
    * columns exactly — encoded as per-file min=max add-action stats, the
    * pushed filters prune partition-mismatched files at plan time without
    * opening any footer.
    */
  def read(spark: SparkSession, tablePath: String,
      withMeta: Boolean = false): DataFrame = {
    if (isMor(spark, tablePath)) return readMor(spark, tablePath, withMeta)
    val files = snapshotFiles(spark, tablePath)
    if (files.isEmpty)
      throw new IllegalArgumentException(
        s"Hudi table has no completed commits: $tablePath")
    val df = scanBase(spark, tablePath, files)
    if (withMeta) df
    else df.select(df.columns.filterNot(_.startsWith("_hoodie_")).map(col): _*)
  }

  private def isMor(spark: SparkSession, tablePath: String): Boolean =
    tableProperties(spark, tablePath).get("hoodie.table.type")
      .exists(_.equalsIgnoreCase("MERGE_ON_READ"))

  private def scanBase(spark: SparkSession, tablePath: String,
      files: Seq[BaseFile]): DataFrame = {
    // schema from the NEWEST instant's footer (one driver-side read)
    val schema = spark.read.parquet(files.maxBy(_.instant).path).schema
    val adds = files.map(f => DeltaNative.AddFile(
      f.path, Map.empty, f.size, partitionStats(f.partition)))
    val snap = DeltaNative.Snapshot(0L, schema, Nil, adds)
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      new HudiFileIndex(spark, tablePath, snap),
      org.apache.spark.sql.types.StructType(Nil), schema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(relation)
  }

  // ------------------------------------------------------- MERGE_ON_READ

  /** MOR snapshot listing: per file group the newest base file whose
    * instant is a completed commit/deltacommit, the log files attached to
    * that base (same fileId + base instant), and the completed-instant set
    * (log BLOCKS are gated by it at read — an uncommitted block is
    * invisible, which is how failed writes roll back for free).
    */
  def morSnapshotFiles(spark: SparkSession, tablePath: String)
      : (Seq[BaseFile], Seq[LogFile], Set[String]) = {
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    val props = tableProperties(spark, tablePath)
    props.get("hoodie.datasource.write.drop.partition.columns")
      .filter(_.equalsIgnoreCase("true"))
      .foreach(_ => throw unsupported("drop.partition.columns=true", tablePath))
    if (fs.exists(new Path(table, ".hoodie/timeline")))
      throw unsupported("timeline layout v2 (.hoodie/timeline/)", tablePath)

    val hoodie = new Path(table, ".hoodie")
    val timeline = fs.listStatus(hoodie).filter(_.isFile).map(_.getPath.getName)
    val commitRe = "^([0-9]+)\\.(commit|deltacommit|replacecommit)$".r
    val completed = mutable.Map.empty[String, String]
    timeline.foreach {
      case commitRe(ts, action) => completed(ts) = action
      case _ => ()
    }
    if (completed.isEmpty) return (Nil, Nil, Set.empty)

    val replaced = mutable.Map.empty[String, String]
    completed.collect { case (ts, "replacecommit") => ts }.foreach { ts =>
      val p = new Path(hoodie, s"$ts.replacecommit")
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Option(mapper.readTree(text).get("partitionToReplaceFileIds")).foreach { byPart =>
        val parts = byPart.fields()
        while (parts.hasNext) {
          val ids = parts.next().getValue
          (0 until ids.size).map(ids.get(_).asText).foreach { id =>
            if (replaced.get(id).forall(_ < ts)) replaced(id) = ts
          }
        }
      }
    }

    val bases = mutable.Buffer.empty[BaseFile]
    val logs = mutable.Buffer.empty[LogFile]
    val it = fs.listFiles(table, true)
    val tableUri = table.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val st = it.next()
      val full = st.getPath.toUri.getPath
      val rel = full.stripPrefix(tableUri).stripPrefix("/")
      val name = st.getPath.getName
      // log files are DOT-files by spec (.fileId_base.log.v_token), so the
      // hidden-file guard applies to the DIRECTORY segments only (.hoodie,
      // .graft_stage_* staging) — a dot-named file still name-matches below
      val hiddenDir = rel.split("/").dropRight(1).exists(_.startsWith("."))
      if (!hiddenDir) {
        def partitionOf: String = rel.stripSuffix("/" + name) match {
          case `rel` => ""
          case d => d
        }
        name match {
          case baseFileRe(fileId, _, instant) if completed.contains(instant) =>
            if (!replaced.get(fileId).exists(_ >= instant))
              bases += BaseFile(partitionOf, fileId, instant,
                st.getPath.toString, st.getLen)
          case logFileRe(fileId, baseInstant, version, _) =>
            logs += LogFile(partitionOf, fileId, baseInstant, version.toInt,
              st.getPath.toString)
          case _ => ()
        }
      }
    }
    val selected = bases.groupBy(f => (f.partition, f.fileId)).values
      .map(_.maxBy(_.instant)).toSeq.sortBy(_.path)
    val selKey = selected.map(b => (b.partition, b.fileId, b.instant)).toSet
    val attached = logs.filter(l =>
      selKey.contains((l.partition, l.fileId, l.baseInstant)))
      .toSeq.sortBy(_.path)
    (selected, attached, completed.keySet.toSet)
  }

  /** MOR snapshot read: base rows merged with the latest log record per
    * record key. See the object scaladoc for the scale shape.
    */
  private def readMor(spark: SparkSession, tablePath: String,
      withMeta: Boolean): DataFrame = {
    val (bases, logs, completed) = morSnapshotFiles(spark, tablePath)
    if (bases.isEmpty)
      throw new IllegalArgumentException(
        s"Hudi table has no completed commits: $tablePath")
    val baseDf = scanBase(spark, tablePath, bases)
    val merged = if (logs.isEmpty) baseDf else {
      val schema = baseDf.schema
      val logRows = parseLogRows(spark, logs, schema, completed)
      val dataCols = schema.fieldNames.toSeq
      // latest-wins per key: one hash aggregation, ordered by (instant,
      // log version, block, record index) — the log's total order
      val latest = logRows
        .groupBy(col("_hoodie_record_key").as("__g_key"))
        .agg(max_by(
          struct((dataCols.map(col) :+ col("__g_del")): _*),
          struct(col("__g_instant"), col("__g_ver"), col("__g_blk"),
            col("__g_idx"))).as("__g_r"))
      val live = latest.filter(!col("__g_r.__g_del"))
        .select(dataCols.map(c => col(s"__g_r.$c")): _*)
      val shadowed = latest.select(col("__g_key").as("_hoodie_record_key"))
      baseDf.join(shadowed, Seq("_hoodie_record_key"), "left_anti")
        .select(dataCols.map(col): _*)
        .unionByName(live)
    }
    if (withMeta) merged
    else merged.select(
      merged.columns.filterNot(_.startsWith("_hoodie_")).map(col): _*)
  }

  /** Log files -> rows, parsed on EXECUTORS (the files are data, not
    * metadata): each data-block record becomes a full row, each
    * delete-block record a key-only tombstone row; every row carries its
    * log total-order coordinates. Blocks whose header instant is not a
    * completed timeline instant are invisible.
    */
  private def parseLogRows(spark: SparkSession, logs: Seq[LogFile],
      schema: org.apache.spark.sql.types.StructType,
      completed: Set[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val ext = StructType(schema.fields ++ Seq(
      StructField("__g_del", BooleanType), StructField("__g_instant", StringType),
      StructField("__g_ver", IntegerType), StructField("__g_blk", IntegerType),
      StructField("__g_idx", IntegerType)))
    val avroJson = HudiLog.toAvroSchema(schema, "HoodieRecord").toString
    val delJson = HudiLog.deleteKeySchema.toString
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf())
    val keyIdx = schema.fieldIndex("_hoodie_record_key")
    val partIdx = schema.fieldIndex("_hoodie_partition_path")
    val n = schema.size
    val metas = logs.map(l => (l.path, l.version))
    val rdd = spark.sparkContext
      .parallelize(metas, math.max(1, math.min(32, metas.size)))
      .flatMap { case (p, ver) =>
        val avroSchema = new org.apache.avro.Schema.Parser().parse(avroJson)
        val delSchema = new org.apache.avro.Schema.Parser().parse(delJson)
        HudiLog.read(confSer.value, new Path(p)).zipWithIndex.flatMap {
          case (b, bi) =>
            val instant = b.header.getOrElse(HudiLog.HInstantTime, "")
            if (!completed.contains(instant)) Nil
            else b.blockType match {
              case HudiLog.AvroDataBlock =>
                HudiLog.decodeRecords(avroSchema, b.content).zipWithIndex.map {
                  case (r, i) => org.apache.spark.sql.Row.fromSeq(
                    HudiLog.avroToRow(r, schema).toSeq ++
                      Seq(false, instant, ver, bi, i))
                }
              case HudiLog.DeleteBlock =>
                HudiLog.decodeRecords(delSchema, b.content).zipWithIndex.map {
                  case (r, i) =>
                    val vals = Array.fill[Any](n)(null)
                    vals(keyIdx) = r.get("recordKey").toString
                    vals(partIdx) = r.get("partitionPath").toString
                    org.apache.spark.sql.Row.fromSeq(
                      vals.toIndexedSeq ++ Seq(true, instant, ver, bi, i))
                }
              case _ => Nil // command/corrupt blocks carry no rows
            }
        }
      }
    spark.createDataFrame(rdd, ext)
  }

  /** MOR UPSERT: every row of `df` (data columns only, no meta) replaces
    * the CURRENT version of the same record key via an Avro data block
    * appended to the key's file group — zero base files rewritten, the
    * point of MERGE_ON_READ. Updates route to their groups with one join
    * against the key index (the snapshot's own meta columns) and each
    * group's log file is written by the executor holding its rows. Keys
    * not present in the table raise (inserts go through `write(append)`).
    * Returns the commit instant.
    */
  def upsert(df: DataFrame, tablePath: String): String = {
    val spark = df.sparkSession
    require(isMor(spark, tablePath), s"upsert needs a MERGE_ON_READ table: $tablePath")
    val (bases, logs, _) = morSnapshotFiles(spark, tablePath)
    val current = readMor(spark, tablePath, withMeta = true)
    val dataCols = current.columns.filterNot(_.startsWith("_hoodie_")).toSeq
    require(df.columns.toSeq == dataCols,
      s"upsert frame columns ${df.columns.toSeq} must match table data columns $dataCols")
    val keyField = tableProperties(spark, tablePath)
      .getOrElse("hoodie.table.recordkey.fields",
        throw new IllegalArgumentException(
          s"no hoodie.table.recordkey.fields in $tablePath"))
    val instant = newInstant(spark, tablePath)

    // key -> (group identity) from the snapshot's own meta columns
    val keyIndex = current.select(col("_hoodie_record_key"),
      col("_hoodie_partition_path"), col("_hoodie_file_name"))
    val keyed = df.withColumn("_hoodie_record_key", col(keyField).cast("string"))
    val unmatched = keyed.join(keyIndex, Seq("_hoodie_record_key"), "left_anti")
    require(unmatched.isEmpty,
      s"upsert keys not present in $tablePath (inserts go through write(append))")
    val routed = keyed.join(keyIndex, Seq("_hoodie_record_key"))
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno",
        concat(lit(instant + "_0_"), monotonically_increasing_id()))
    val fullCols = current.columns.toSeq
    val rows = routed.select(fullCols.map(col): _*)
    writeGroupedLogs(spark, tablePath, rows, bases, logs, instant,
      deleteBlock = false)
    instant
  }

  /** MOR row-level DELETE: matched keys become delete-block tombstones in
    * their file groups. Returns the commit instant (current instant when
    * nothing matches).
    */
  def deleteWhere(spark: SparkSession, tablePath: String,
      condition: org.apache.spark.sql.Column): String = {
    require(isMor(spark, tablePath),
      s"log-block delete needs a MERGE_ON_READ table: $tablePath")
    val (bases, logs, _) = morSnapshotFiles(spark, tablePath)
    val current = readMor(spark, tablePath, withMeta = true)
    val matched = current.filter(condition)
    val instant = newInstant(spark, tablePath)
    writeGroupedLogs(spark, tablePath, matched, bases, logs, instant,
      deleteBlock = true)
    instant
  }

  /** MOR COMPACTION: rewrite every file group that has log files as a new
    * base file at a fresh commit instant, merging base + latest log records
    * (the merged snapshot is unchanged by construction — compaction is pure
    * reorganization). The new slice's instant postdates every log's base
    * instant, so the old log chain detaches: subsequent reads scan plain
    * parquet and subsequent upserts log against the new base. This is what
    * keeps MOR log chains short at scale — [[writeGroupedLogs]]'s bounded
    * per-group fold assumes someone runs it.
    *
    * One distributed job: rows route to their group by the
    * `_hoodie_file_name` meta column (hash repartition on the group, one
    * file per group), then the driver does one rename per group — metadata
    * ops only, the same O(groups) cost any commit pays. Groups whose every
    * row is tombstoned become an empty base file, retiring their data
    * without a replacecommit. Returns the compaction instant (a `commit`
    * action, as real compaction completes), or the current latest instant
    * when there are no logs to compact.
    */
  def compact(spark: SparkSession, tablePath: String): String = {
    require(isMor(spark, tablePath),
      s"compact needs a MERGE_ON_READ table: $tablePath")
    val (bases, logs, _) = morSnapshotFiles(spark, tablePath)
    require(bases.nonEmpty, s"Hudi table has no completed commits: $tablePath")
    if (logs.isEmpty) return bases.map(_.instant).max
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val merged = readMor(spark, tablePath, withMeta = true)
    val instant = newInstant(spark, tablePath)
    val withLogs = logs.map(l => (l.partition, l.fileId)).toSet
    val targets = bases.filter(b => withLogs.contains((b.partition, b.fileId)))
    val nameToGroup = targets.map(b => new Path(b.path).getName -> b).toMap
    val cols = merged.columns.toSeq

    val rows = merged
      .filter(col("_hoodie_file_name").isin(nameToGroup.keys.toSeq: _*))
      .withColumn("__grp", col("_hoodie_file_name"))
      // stamp the new slice's file name; record commit times are preserved
      // (compaction rewrites records, it does not re-author them)
      .withColumn("_hoodie_file_name",
        concat(substring_index(col("_hoodie_file_name"), "_", 1),
          lit(s"_0-0-0_$instant.parquet")))
    val stage = new Path(table, s".graft_stage_${java.util.UUID.randomUUID}")
    rows.repartition(col("__grp")).write.partitionBy("__grp")
      .parquet(stage.toString)

    nameToGroup.foreach { case (oldName, g) =>
      val dir = new Path(stage, s"__grp=$oldName")
      val newName = s"${g.fileId}_0-0-0_$instant.parquet"
      val destDir = if (g.partition.isEmpty) table
        else new Path(table, g.partition)
      val part = if (fs.exists(dir)) fs.listStatus(dir).map(_.getPath)
        .find(_.getName.endsWith(".parquet")) else None
      part match {
        case Some(one) => fs.rename(one, new Path(destDir, newName))
        case None => // fully-tombstoned group: write an empty base file
          val empty = new Path(stage, s".empty_${g.fileId}")
          merged.limit(0).select(cols.map(col): _*)
            .coalesce(1).write.parquet(empty.toString)
          val f = fs.listStatus(empty).map(_.getPath)
            .find(_.getName.endsWith(".parquet")).get
          fs.rename(f, new Path(destDir, newName))
      }
    }
    fs.delete(stage, true)

    val hoodie = new Path(table, ".hoodie")
    val root = mapper.createObjectNode()
    root.put("operationType", "compaction")
    val pws = root.putObject("partitionToWriteStats")
    targets.groupBy(_.partition).foreach { case (part, gs) =>
      val arr = pws.putArray(part)
      gs.foreach { g =>
        val o = arr.addObject()
        o.put("fileId", g.fileId)
        o.put("path", (if (part.isEmpty) "" else part + "/") +
          s"${g.fileId}_0-0-0_$instant.parquet")
      }
    }
    Seq(s"$instant.commit.requested", s"$instant.commit.inflight").foreach { n =>
      val out = fs.create(new Path(hoodie, n), true); out.close()
    }
    val out = fs.create(new Path(hoodie, s"$instant.commit"), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    instant
  }

  /** Group `rows` (full-schema, `_hoodie_file_name` identifying the file
    * group) by file group and write ONE new log file per group on the
    * executor holding that group's rows; then complete the deltacommit.
    * A group's worth of one commit's updates is bounded (compaction keeps
    * log chains short), so the per-group fold is safe.
    */
  private def writeGroupedLogs(spark: SparkSession, tablePath: String,
      rows: DataFrame, bases: Seq[BaseFile], logs: Seq[LogFile],
      instant: String, deleteBlock: Boolean): Unit = {
    import org.apache.spark.sql.{Encoders, Row}
    val schema = rows.schema
    val avroJson = HudiLog.toAvroSchema(schema, "HoodieRecord").toString
    val delJson = HudiLog.deleteKeySchema.toString
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf())
    // fileId -> (partition dir, base instant, next log version)
    val nextVer: Map[String, (String, String, Int)] = bases.map { b =>
      val existing = logs.filter(l => l.fileId == b.fileId &&
        l.partition == b.partition).map(_.version)
      b.fileId -> ((b.partition, b.instant,
        (existing :+ 0).max + 1))
    }.toMap
    val keyIdx = schema.fieldIndex("_hoodie_record_key")
    val partIdx = schema.fieldIndex("_hoodie_partition_path")
    val fileIdx = schema.fieldIndex("_hoodie_file_name")
    val tableStr = tablePath
    val written = rows.groupByKey((r: Row) =>
        r.getString(fileIdx).split("_")(0))(Encoders.STRING)
      .mapGroups { (fileId: String, it: Iterator[Row]) =>
        val avroSchema = new org.apache.avro.Schema.Parser().parse(avroJson)
        val delSchema = new org.apache.avro.Schema.Parser().parse(delJson)
        val (partition, baseInstant, ver) = nextVer(fileId)
        val recs = it.toSeq
        val (btype, content) =
          if (deleteBlock)
            (HudiLog.DeleteBlock, HudiLog.encodeRecords(delSchema,
              recs.map { r =>
                val d = new org.apache.avro.generic.GenericData.Record(delSchema)
                d.put("recordKey", r.getString(keyIdx))
                d.put("partitionPath",
                  if (r.isNullAt(partIdx)) "" else r.getString(partIdx))
                d
              }))
          else
            (HudiLog.AvroDataBlock, HudiLog.encodeRecords(avroSchema,
              recs.map(HudiLog.rowToAvro(_, schema, avroSchema))))
        val dir = if (partition.isEmpty) new Path(tableStr)
          else new Path(tableStr, partition)
        val logPath = new Path(dir,
          s".${fileId}_$baseInstant.log.${ver}_0-0-0")
        HudiLog.write(confSer.value, logPath, Seq(HudiLog.Block(btype,
          Map(HudiLog.HInstantTime -> instant, HudiLog.HSchema ->
            (if (deleteBlock) delJson else avroJson)), content)))
        logPath.toString
      }(Encoders.STRING)
      .collect()

    // requested -> inflight -> completed deltacommit; blocks become
    // visible only now (read gates on completed instants)
    val hoodie = new Path(tablePath, ".hoodie")
    val fs = hoodie.getFileSystem(spark.sessionState.newHadoopConf())
    val root = mapper.createObjectNode()
    root.put("operationType", if (deleteBlock) "delete" else "upsert")
    val pws = root.putObject("partitionToWriteStats")
    written.foreach { p => pws.putArray(new Path(p).getParent.getName) }
    Seq(s"$instant.deltacommit.requested", s"$instant.deltacommit.inflight")
      .foreach { n => val o = fs.create(new Path(hoodie, n), true); o.close() }
    val out = fs.create(new Path(hoodie, s"$instant.deltacommit"), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
  }

  /** Hudi incremental query — the real contract: rows whose
    * `_hoodie_commit_time` is strictly after `sinceInstant`. Two-level
    * pruning, the way Hudi's own incremental relation plans it:
    * file slices whose latest instant <= since cannot contain post-anchor
    * rows (a CoW rewrite bumps the slice's instant), so they are dropped
    * before any footer is opened; inside surviving files the meta-column
    * predicate keeps exactly the rows written after the anchor — which is
    * why UPSERTS are served correctly (only the changed rows of a
    * rewritten group come back), the semantics Hudi incremental queries
    * are known for. Deletes are not propagated (same as Hudi without the
    * CDC feature) — a consumer needing deletes must full-refresh.
    */
  def readSince(spark: SparkSession, tablePath: String, sinceInstant: String,
      withMeta: Boolean = false): DataFrame = {
    val all = snapshotFiles(spark, tablePath)
    if (all.isEmpty)
      throw new IllegalArgumentException(
        s"Hudi table has no completed commits: $tablePath")
    val tail = all.filter(_.instant > sinceInstant)
    val base = scanBase(spark, tablePath,
        if (tail.nonEmpty) tail else all.take(1)) // schema-only scan if caught up
      .filter(col("_hoodie_commit_time") > lit(sinceInstant))
    val limited = if (tail.nonEmpty) base else base.limit(0)
    if (withMeta) limited
    else limited.select(
      limited.columns.filterNot(_.startsWith("_hoodie_")).map(col): _*)
  }

  /** Per-file stats JSON from a hive partition path (`k=v/k2=v2`): each
    * partition column is constant within the file, so min = max = value
    * (and a null partition value is all-null for that column) — enough
    * for [[DeltaStats.skipper]] to prune on partition predicates.
    */
  private[io] def partitionStats(partition: String): Option[String] = {
    if (partition.isEmpty) return None
    val root = mapper.createObjectNode()
    val minN = root.putObject("minValues")
    val maxN = root.putObject("maxValues")
    val nullN = root.putObject("nullCount")
    var anyNull = false
    partition.split("/").foreach { seg =>
      seg.split("=", 2) match {
        case Array(k, raw) =>
          if (raw == "__HIVE_DEFAULT_PARTITION__") {
            nullN.put(k, 1L); anyNull = true
          } else {
            val v = java.net.URLDecoder.decode(raw.replace("+", "%2B"), "UTF-8")
            minN.put(k, v); maxN.put(k, v); nullN.put(k, 0L)
          }
        case _ => ()
      }
    }
    // numRecords only matters for the all-null case (allNull = nc >= nr);
    // 1 is a safe stand-in: the column is null in EVERY row of the file
    if (anyNull) root.put("numRecords", 1L)
    Some(mapper.writeValueAsString(root))
  }

  // ---------------------------------------------------------------- writer

  /** Minimal spec-conformant CoW writer (fixture-grade: single writer, no
    * metadata table): hive-style partition dirs, `_hoodie_*` meta columns,
    * base-file naming, and a completed-commit timeline. `mode` = "append"
    * (new file groups) | "overwrite" (replacecommit retiring every current
    * group). Returns the commit instant.
    */
  def write(df: DataFrame, tablePath: String, partitionBy: Seq[String] = Nil,
      mode: String = "append", recordKeyField: String = "",
      tableType: String = "COPY_ON_WRITE"): String = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val hoodie = new Path(table, ".hoodie")
    val fs = table.getFileSystem(conf)
    val firstCommit = !fs.exists(new Path(hoodie, "hoodie.properties"))
    if (firstCommit) {
      fs.mkdirs(hoodie)
      val props = new java.util.Properties()
      props.setProperty("hoodie.table.name", table.getName)
      props.setProperty("hoodie.table.type", tableType.toUpperCase)
      props.setProperty("hoodie.table.version", "6")
      props.setProperty("hoodie.timeline.layout.version", "1")
      if (recordKeyField.nonEmpty)
        props.setProperty("hoodie.table.recordkey.fields", recordKeyField)
      if (partitionBy.nonEmpty)
        props.setProperty("hoodie.table.partition.fields", partitionBy.mkString(","))
      val out = fs.create(new Path(hoodie, "hoodie.properties"), true)
      try props.store(out, "graft native writer") finally out.close()
    }

    val mor = isMor(spark, tablePath)
    val priorGroups =
      if (firstCommit) Nil
      else if (mor) morSnapshotFiles(spark, tablePath)._1
      else snapshotFiles(spark, tablePath)
    val instant = newInstant(spark, tablePath)
    val keyCol = if (recordKeyField.nonEmpty) col(recordKeyField)
      else col(df.columns.head)
    val partSegs: Seq[org.apache.spark.sql.Column] = partitionBy.map { c =>
      concat(lit(c + "="), coalesce(col(c).cast("string"),
        lit("__HIVE_DEFAULT_PARTITION__")))
    }
    val partPathCol =
      if (partitionBy.isEmpty) lit("") else concat_ws("/", partSegs: _*)
    val withMeta = df
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno",
        concat(lit(instant + "_0_"), monotonically_increasing_id()))
      .withColumn("_hoodie_record_key", keyCol.cast("string"))
      .withColumn("_hoodie_partition_path", partPathCol)
      .withColumn("_hoodie_file_name", lit(""))
      // meta columns lead, as the real writer lays them out
      .select((Seq("_hoodie_commit_time", "_hoodie_commit_seqno",
        "_hoodie_record_key", "_hoodie_partition_path", "_hoodie_file_name")
        ++ df.columns).map(col): _*)

    val tmp = new Path(table, s".graft_stage_${java.util.UUID.randomUUID}")
    val w = if (partitionBy.nonEmpty) withMeta.write.partitionBy(partitionBy: _*)
      else withMeta.write
    w.parquet(tmp.toString)

    // partitionBy drops the partition columns from the data files; Hudi CoW
    // keeps them. Re-read each staged dir and rewrite complete rows.
    val stats = mutable.Map.empty[String, mutable.Buffer[(String, String)]]
    def finalize(dir: Path, partition: String,
        partVals: Map[String, Option[String]]): Unit = {
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.contains("=")) {
          val Array(k, raw) = n.split("=", 2)
          // '+' is literal in hive partition dirs — protect it from
          // URLDecoder's form-decoding (same rule as partitionStats)
          val v = if (raw == "__HIVE_DEFAULT_PARTITION__") None
            else Some(java.net.URLDecoder.decode(raw.replace("+", "%2B"), "UTF-8"))
          val rel = if (partition.isEmpty) n else partition + "/" + n
          finalize(st.getPath, rel, partVals + (k -> v))
        } else if (st.isFile && n.endsWith(".parquet")) {
          var part = spark.read.parquet(st.getPath.toString)
          partVals.foreach { case (k, v) =>
            val ft = df.schema(k).dataType
            part = part.withColumn(k,
              v.map(s => lit(s).cast(ft)).getOrElse(lit(null).cast(ft)))
          }
          val fileId = java.util.UUID.randomUUID.toString + "-0"
          val fileName = s"${fileId}_0-0-0_$instant.parquet"
          // a real writer stamps the file's own name into the meta column;
          // MOR upsert routing resolves each key's file group through it
          part = part.withColumn("_hoodie_file_name", lit(fileName))
            .select(withMeta.columns.map(col): _*)
          val destDir = if (partition.isEmpty) table else new Path(table, partition)
          fs.mkdirs(destDir)
          val stage2 = new Path(table, s".graft_one_${java.util.UUID.randomUUID}")
          part.coalesce(1).write.parquet(stage2.toString)
          val one = fs.listStatus(stage2).map(_.getPath)
            .find(_.getName.endsWith(".parquet")).get
          fs.rename(one, new Path(destDir, fileName))
          fs.delete(stage2, true)
          stats.getOrElseUpdate(partition, mutable.Buffer.empty) +=
            ((fileId, (if (partition.isEmpty) "" else partition + "/") + fileName))
        }
      }
    }
    finalize(tmp, "", Map.empty)
    fs.delete(tmp, true)

    val action = if (mode == "overwrite" && priorGroups.nonEmpty)
      "replacecommit" else if (mor) "deltacommit" else "commit"
    val root = mapper.createObjectNode()
    root.put("operationType",
      if (action == "replacecommit") "insert_overwrite" else "upsert")
    val pws = root.putObject("partitionToWriteStats")
    stats.foreach { case (part, files) =>
      val arr = pws.putArray(part)
      files.foreach { case (fid, rel) =>
        val o = arr.addObject()
        o.put("fileId", fid); o.put("path", rel)
      }
    }
    if (action == "replacecommit") {
      val pr = root.putObject("partitionToReplaceFileIds")
      priorGroups.groupBy(_.partition).foreach { case (part, gs) =>
        val arr = pr.putArray(part)
        gs.map(_.fileId).distinct.foreach(arr.add)
      }
    }
    // requested -> inflight -> completed, as the real timeline records them
    Seq(s"$instant.$action.requested", s"$instant.$action.inflight").foreach { n =>
      val out = fs.create(new Path(hoodie, n), true); out.close()
    }
    val out = fs.create(new Path(hoodie, s"$instant.$action"), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    instant
  }

  /** Rewrite ONE existing file group at a new instant (what a real upsert's
    * copy-on-write does) — lets specs exercise latest-slice selection.
    */
  private[graft] def rewriteGroup(spark: SparkSession, tablePath: String,
      group: BaseFile, newData: DataFrame): String = {
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val instant = newInstant(spark, tablePath)
    val schema = spark.read.parquet(group.path).schema
    val aligned = newData
      .withColumn("_hoodie_commit_time", lit(instant))
      .select(schema.fieldNames.map(col): _*)
    val stage = new Path(table, s".graft_one_${java.util.UUID.randomUUID}")
    aligned.coalesce(1).write.parquet(stage.toString)
    val one = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val destDir = if (group.partition.isEmpty) table
      else new Path(table, group.partition)
    fs.rename(one, new Path(destDir, s"${group.fileId}_0-0-0_$instant.parquet"))
    fs.delete(stage, true)
    val hoodie = new Path(table, ".hoodie")
    val root = mapper.createObjectNode()
    root.put("operationType", "upsert")
    root.putObject("partitionToWriteStats")
    val out = fs.create(new Path(hoodie, s"$instant.commit"), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    instant
  }

  /** Next commit instant: yyyyMMddHHmmssSSS, strictly after every timeline
    * entry (wall clock, bumped past the max existing instant).
    */
  private def newInstant(spark: SparkSession, tablePath: String): String = {
    val hoodie = new Path(tablePath, ".hoodie")
    val fs = hoodie.getFileSystem(spark.sessionState.newHadoopConf())
    val fmt = new java.text.SimpleDateFormat("yyyyMMddHHmmssSSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val now = fmt.format(new java.util.Date())
    val existing = fs.listStatus(hoodie).map(_.getPath.getName)
      .collect { case n if n.headOption.exists(_.isDigit) => n.takeWhile(_.isDigit) }
    val floor = existing.foldLeft("")((a, b) => if (a >= b) a else b)
    if (now > floor) now else (BigInt(floor) + 1).toString
  }

  private def unsupported(what: String, tablePath: String) =
    new UnsupportedOperationException(
      s"Hudi table $tablePath uses $what, which the native CoW reader does " +
        "not support; add the org.apache.hudi connector jar to read it " +
        "(Sources.lakehouseAvailable prefers the connector automatically)")
}
