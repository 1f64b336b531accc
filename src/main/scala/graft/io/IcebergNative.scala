package graft.io

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Native Apache Iceberg reader — a from-scratch implementation of the
  * public Iceberg table spec (iceberg.apache.org/spec: metadata json →
  * manifest list (Avro) → manifests (Avro) → data files), used by
  * [[Sources.iceberg]] when no connector jar is on the classpath
  * (reference `iceberg()`: datastore/table_functions.py:868 — read-only
  * path scan; ClickHouse's Iceberg engine is the same metadata walk).
  *
  * Like Delta, ALL of this is metadata measured in KBs-to-MBs even for a
  * 100 TB table; the walk happens on the driver and the resulting file
  * list feeds one distributed `spark.read.parquet` scan (Iceberg data
  * files carry complete rows — identity-partition values included — so no
  * per-file value attachment is needed; Avro arrives on the classpath with
  * Spark itself).
  *
  * Coverage: format v1 and v2 metadata; `version-hint.text` or
  * newest-`*.metadata.json` discovery; manifest-list or v1 inline
  * `manifests`; `status=DELETED` entry filtering; snapshot selection via
  * `current-snapshot-id` (plus `snapshotAsOf` time travel by snapshot id);
  * v2 row-level DELETE FILES (r10) — positional and equality, read as
  * DataFrames and subtracted with sequence-number-gated anti-joins
  * ([[applyDeleteFiles]]), written by [[deleteWhere]] /
  * [[deleteWhereEquality]]. Unsupported-by-design (capability error,
  * never wrong rows): non-parquet data/delete files.
  *
  * Column resolution (r9): by FIELD ID, the spec's rule — the schema's
  * ids ride as `parquet.field.id` metadata into Spark's parquet reader,
  * so renamed columns keep reading ([[renameColumn]] is the id-preserving
  * metadata-only rename). Legacy id-less data files (pre-r9 fixtures)
  * fall back to name matching via a footer probe.
  */
object IcebergNative {

  private val mapper = new ObjectMapper()

  /** Locate and parse the current metadata JSON. */
  private def currentMetadata(spark: SparkSession, tablePath: String): (Path, JsonNode) = {
    val meta = new Path(tablePath, "metadata")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(meta))
      throw new IllegalArgumentException(
        s"not an Iceberg table (no metadata/ directory): $tablePath")
    val hint = new Path(meta, "version-hint.text")
    val metaFile =
      if (fs.exists(hint)) {
        val in = fs.open(hint)
        val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        new Path(meta, s"v$v.metadata.json")
      } else {
        val cands = fs.listStatus(meta).map(_.getPath.getName)
          .filter(_.endsWith(".metadata.json")).sorted
        if (cands.isEmpty)
          throw new IllegalArgumentException(
            s"not an Iceberg table (no *.metadata.json): $tablePath")
        new Path(meta, cands.last)
      }
    val in = fs.open(metaFile)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    (metaFile, mapper.readTree(text))
  }

  final case class DataFileRef(path: String, format: String, recordCount: Long,
      size: Long = 0L, stats: Option[String] = None, seq: Long = 0L)

  /** A v2 delete file. `content` 1 = position deletes (rows of
    * `(file_path, pos)`), 2 = equality deletes (rows of the columns named
    * by `equalityIds`). `seq` is its data sequence number — the spec's
    * applicability gate: a position delete applies to data files with
    * data seq <= its seq, an equality delete to data files with data seq
    * STRICTLY < its seq (so rows appended after the delete survive).
    */
  final case class DeleteFileRef(path: String, format: String, content: Int,
      equalityIds: Seq[Int], seq: Long)

  /** Data files of the chosen snapshot (compat wrapper: errors if the
    * snapshot carries v2 delete files — callers that can apply them use
    * [[planFilesWithDeletes]]).
    */
  def planFiles(spark: SparkSession, tablePath: String,
      snapshotAsOf: Option[Long] = None): (StructType, Seq[DataFileRef]) = {
    val (schema, files, deletes) = planFilesWithDeletes(spark, tablePath, snapshotAsOf)
    if (deletes.nonEmpty)
      throw unsupported("v2 delete files via the files-only plan API", tablePath)
    (schema, files)
  }

  /** Data + delete files of the chosen snapshot (default: current). */
  def planFilesWithDeletes(spark: SparkSession, tablePath: String,
      snapshotAsOf: Option[Long] = None)
      : (StructType, Seq[DataFileRef], Seq[DeleteFileRef]) = {
    val conf = spark.sessionState.newHadoopConf()
    val (_, root) = currentMetadata(spark, tablePath)

    val schema = {
      val byId = Option(root.get("schemas")).map { arr =>
        (0 until arr.size).map(arr.get).map(s =>
          s.get("schema-id").asLong -> s).toMap
      }.getOrElse(Map.empty[Long, JsonNode])
      val chosen = Option(root.get("current-schema-id")).map(_.asLong)
        .flatMap(byId.get)
        .orElse(Option(root.get("schema"))) // v1 single-schema layout
        .getOrElse(throw new IllegalArgumentException(
          s"no schema in Iceberg metadata: $tablePath"))
      icebergSchemaToSpark(chosen)
    }

    val snapshots = Option(root.get("snapshots"))
      .map(arr => (0 until arr.size).map(arr.get)).getOrElse(Nil)
    val wantedId = snapshotAsOf.orElse(
      Option(root.get("current-snapshot-id")).map(_.asLong).filter(_ != -1L))
    val snap = wantedId.flatMap(id =>
      snapshots.find(_.get("snapshot-id").asLong == id))
    // time travel to a bogus/expired snapshot must error, not read empty
    if (snap.isEmpty && snapshotAsOf.isDefined)
      throw new IllegalArgumentException(
        s"Iceberg snapshot ${snapshotAsOf.get} not found (expired?): $tablePath")
    if (snap.isEmpty) return (schema, Nil, Nil) // empty table: no snapshot yet

    // (path, content: 0 data / 1 deletes, sequence number)
    val manifestPaths: Seq[(String, Int, Long)] =
      Option(snap.get.get("manifest-list")).map { mlNode =>
        val mlPath = toFsPath(mlNode.asText, tablePath)
        readAvro(spark, mlPath).map { r =>
          val content = optAvro(r, "content").map(_.toString.toInt).getOrElse(0)
          val seq = optAvro(r, "sequence_number").map(_.toString.toLong).getOrElse(0L)
          (r.get("manifest_path").toString, content, seq)
        }
      }.orElse(Option(snap.get.get("manifests")).map { arr => // v1 inline
        (0 until arr.size).map(i => (arr.get(i).asText, 0, 0L))
      }).getOrElse(throw new IllegalArgumentException(
        s"snapshot has neither manifest-list nor manifests: $tablePath"))

    // top-level (field-id -> (name, iceberg-type)) for decoding the
    // manifest's bounds maps back into named column stats
    val fieldById: Map[Int, (String, String)] = {
      val chosen = Option(root.get("schemas")).flatMap { arr =>
        val byId = (0 until arr.size).map(arr.get).map(s =>
          s.get("schema-id").asLong -> s).toMap
        Option(root.get("current-schema-id")).map(_.asLong).flatMap(byId.get)
      }.orElse(Option(root.get("schema")))
      chosen.map { s =>
        jsonSeq(s.get("fields")).flatMap { f =>
          val t = f.get("type")
          if (t != null && t.isTextual && f.get("id") != null)
            Some(f.get("id").asInt -> (f.get("name").asText, t.asText))
          else None
        }.toMap
      }.getOrElse(Map.empty)
    }

    val files = mutable.Buffer.empty[DataFileRef]
    val deletes = mutable.Buffer.empty[DeleteFileRef]
    manifestPaths.foreach { case (mp, listContent, mseq) =>
      readAvro(spark, toFsPath(mp, tablePath)).foreach { entry =>
        val status = Option(entry.get("status")).map(_.toString.toInt).getOrElse(1)
        if (status != 2) { // 2 = DELETED
          val dfRec = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = optAvro(dfRec, "content").map(_.toString.toInt)
            .getOrElse(if (listContent == 1) 1 else 0)
          val fmt = dfRec.get("file_format").toString.toLowerCase
          // entry-level data sequence number when explicit, else inherited
          // from the manifest-list entry (the v2 inheritance rule)
          val eseq = optAvro(entry, "sequence_number")
            .map(_.toString.toLong).getOrElse(mseq)
          if (content == 0) {
            if (fmt != "parquet")
              throw unsupported(s"$fmt data files", tablePath)
            val rc = Option(dfRec.get("record_count")).map(_.toString.toLong).getOrElse(0L)
            files += DataFileRef(dfRec.get("file_path").toString, fmt, rc,
              Option(dfRec.get("file_size_in_bytes")).map(_.toString.toLong).getOrElse(0L),
              manifestStats(dfRec, rc, fieldById), eseq)
          } else {
            if (fmt != "parquet")
              throw unsupported(s"$fmt delete files", tablePath)
            val eqIds = optAvro(dfRec, "equality_ids").orNull match {
              case c: java.util.Collection[_] => c.asScala.toSeq.map(_.toString.toInt)
              case _ => Nil
            }
            if (content == 2 && eqIds.isEmpty)
              throw unsupported("equality delete files without equality_ids",
                tablePath)
            deletes += DeleteFileRef(dfRec.get("file_path").toString, fmt,
              content, eqIds, eseq)
          }
        }
      }
    }
    (schema, files.toSeq, deletes.toSeq)
  }

  /** Manifest entry bounds/null-counts → the same per-file stats JSON the
    * Delta tier uses, so [[DeltaStats.skipper]] prunes Iceberg scans too.
    * Bounds use Iceberg's binary single-value serialization (spec
    * Appendix D, little-endian); unknown types are simply omitted —
    * skipping stays conservative.
    */
  private def manifestStats(dfRec: GenericRecord, recordCount: Long,
      fieldById: Map[Int, (String, String)]): Option[String] = {
    def entries(field: String): Seq[(Int, Any)] = dfRec.get(field) match {
      case arr: java.util.Collection[_] =>
        arr.asScala.toSeq.collect { case r: GenericRecord =>
          (r.get("key").toString.toInt, r.get("value")) }
      case m: java.util.Map[_, _] => // plain Avro map with stringified keys
        m.asScala.toSeq.flatMap { case (k, v) =>
          scala.util.Try(k.toString.toInt).toOption.map(_ -> v) }
      case _ => Nil
    }
    val lower = entries("lower_bounds")
    val upper = entries("upper_bounds")
    val nulls = entries("null_value_counts")
    if (lower.isEmpty && upper.isEmpty && nulls.isEmpty) return None
    val root = mapper.createObjectNode()
    if (recordCount > 0) root.put("numRecords", recordCount)
    val minN = root.putObject("minValues")
    val maxN = root.putObject("maxValues")
    val nullN = root.putObject("nullCount")
    def put(target: com.fasterxml.jackson.databind.node.ObjectNode,
        kv: Seq[(Int, Any)]): Unit =
      kv.foreach { case (id, raw) =>
        for ((name, typ) <- fieldById.get(id);
             node <- decodeBound(raw, typ)) target.set[JsonNode](name, node)
      }
    put(minN, lower)
    put(maxN, upper)
    nulls.foreach { case (id, v) =>
      fieldById.get(id).foreach { case (name, _) =>
        nullN.put(name, v.toString.toLong) }
    }
    Some(mapper.writeValueAsString(root))
  }

  /** Iceberg binary single-value → stats JSON node (see Appendix D). */
  private def decodeBound(raw: Any, icebergType: String): Option[JsonNode] = {
    val bytes: Array[Byte] = raw match {
      case bb: java.nio.ByteBuffer =>
        val b = bb.duplicate(); val a = new Array[Byte](b.remaining); b.get(a); a
      case a: Array[Byte] => a
      case _ => return None
    }
    def le = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nf = mapper.getNodeFactory
    icebergType match {
      case "int" if bytes.length == 4 => Some(nf.numberNode(le.getInt))
      case "long" if bytes.length == 8 => Some(nf.numberNode(le.getLong))
      case "float" if bytes.length == 4 =>
        Some(le.getFloat).filter(f => !f.isNaN && !f.isInfinite).map(nf.numberNode(_))
      case "double" if bytes.length == 8 =>
        Some(le.getDouble).filter(d => !d.isNaN && !d.isInfinite).map(nf.numberNode(_))
      case "boolean" if bytes.length == 1 => Some(nf.booleanNode(bytes(0) != 0))
      case "date" if bytes.length == 4 =>
        Some(nf.textNode(java.time.LocalDate.ofEpochDay(le.getInt.toLong).toString))
      case "timestamp" | "timestamptz" if bytes.length == 8 =>
        val us = le.getLong
        Some(nf.textNode(java.time.format.DateTimeFormatter.ISO_INSTANT.format(
          java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L))))
      case "string" => Some(nf.textNode(new String(bytes, "UTF-8")))
      case _ => None
    }
  }

  /** Read the table as a DataFrame (current snapshot, or `snapshotAsOf`
    * a specific snapshot id).
    *
    * Served through [[IcebergFileIndex]]: data files carry complete rows
    * (no partition schema), and the manifest's per-file
    * lower/upper_bounds + null_value_counts are decoded into the shared
    * stats-skipping machinery, so pushed filters prune files at plan time
    * from manifest metadata alone.
    */
  def read(spark: SparkSession, tablePath: String,
      snapshotAsOf: Option[Long] = None): DataFrame = {
    val (schema, files, deletes) =
      planFilesWithDeletes(spark, tablePath, snapshotAsOf)
    scanFiles(spark, tablePath, schema, files, deletes)
  }

  private def scanFiles(spark: SparkSession, tablePath: String,
      schema: StructType, files: Seq[DataFileRef],
      deletes: Seq[DeleteFileRef] = Nil,
      withMeta: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val outSchema = stripParquetIds(schema)
    if (files.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
      return if (!withMeta) empty
        else empty.withColumn("__graft_path", lit(null).cast("string"))
          .withColumn("__graft_pos", lit(null).cast("long"))
    }
    // field-id resolution (the spec's column-resolution rule) when the
    // data files actually carry ids — real Iceberg writers ALWAYS do (the
    // spec requires ids in data files; ours stamps them since r9), so
    // id-less files only arise from this repo's pre-r9 fixtures. Probe a
    // bounded prefix of footers: a MIXED table (legacy + stamped) cannot
    // be resolved one way globally — id mode would silently serve nulls
    // from the legacy files for renamed columns — so fail loudly instead.
    val conf0 = spark.sessionState.newHadoopConf()
    val probed = files.take(32).map(f =>
      fileHasFieldIds(conf0, toFsPath(f.path, tablePath)))
    if (probed.distinct.size > 1)
      throw unsupported(
        "a mix of id-stamped and legacy id-less data files", tablePath)
    val useIds = schema.exists(_.metadata.contains("parquet.field.id")) &&
      probed.headOption.getOrElse(false)
    // deliberately session-sticky: the scan executes LAZILY (a save/restore
    // around construction would be gone by execution time), and the key is
    // inert for schemas that don't carry parquet.field.id metadata — i.e.
    // it affects exactly these scans
    if (useIds)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val resolved = if (useIds) schema else outSchema
    val relaxed = StructType(resolved.map(_.copy(nullable = true)))
    val fs0 = new Path(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
    val adds = files.map { f =>
      val p = toFsPath(f.path, tablePath)
      // a wrong length would TRUNCATE the scan; trust the manifest only
      // when it actually recorded one
      val sz = if (f.size > 0) f.size else fs0.getFileStatus(p).getLen
      DeltaNative.AddFile(p.toString, Map.empty, sz, f.stats)
    }
    val snap = DeltaNative.Snapshot(0L, relaxed, Nil, adds)
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      new IcebergFileIndex(spark, tablePath, snap),
      StructType(Nil), relaxed, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty[String, String])(spark)
    val base = spark.baseRelationToDataFrame(relation)
    val needMeta = withMeta || deletes.nonEmpty
    val withCols = if (!needMeta) base
      else base.withColumn("__graft_path", col("_metadata.file_path"))
        .withColumn("__graft_pos", col("_metadata.row_index"))
    val undeleted = applyDeleteFiles(spark, tablePath, withCols, schema,
      files, deletes)
    val outCols = outSchema.map(f => col(f.name)) ++
      (if (withMeta) Seq(col("__graft_path"), col("__graft_pos")) else Nil)
    if (needMeta) undeleted.select(outCols: _*) else undeleted
  }

  /** Strip the URI scheme so a scanned `_metadata.file_path` and a
    * manifest's `file_path` compare equal regardless of how each renders
    * the same file (`file:/x`, `file:///x`, `/x`).
    */
  private val schemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:/+"
  private def normPath(p: String): String = p.replaceFirst(schemeRe, "/")

  /** Apply v2 delete files to the scanned rows — Spark-first: the delete
    * files are read as DataFrames (bytes proportional to DELETED rows)
    * and subtracted with anti-joins, so nothing is materialized on the
    * driver and Catalyst/AQE picks broadcast vs shuffle as the delete set
    * grows. Sequence-number gates ride the joins via a per-FILE (path,
    * seq) frame — metadata-sized, broadcast.
    */
  private def applyDeleteFiles(spark: SparkSession, tablePath: String,
      scanned: DataFrame, schema: StructType, files: Seq[DataFileRef],
      deletes: Seq[DeleteFileRef]): DataFrame = {
    import org.apache.spark.sql.functions._
    if (deletes.isEmpty) return scanned
    // rows tagged with their file's normalized path + data sequence number
    val fileSeq = spark.createDataFrame(files.map(f =>
      (normPath(toFsPath(f.path, tablePath).toString), f.seq)))
      .toDF("__g_npath", "__g_dseq")
    var rows = scanned
      .withColumn("__g_npath", regexp_replace(col("__graft_path"), schemeRe, "/"))
      .join(broadcast(fileSeq), "__g_npath")

    // position deletes, grouped by sequence number (one scan per group)
    val posBySeq = deletes.filter(_.content == 1).groupBy(_.seq).toSeq
    posBySeq.foreach { case (dseq, dfs) =>
      val del = spark.read
        .parquet(dfs.map(d => toFsPath(d.path, tablePath).toString): _*)
        .select(regexp_replace(col("file_path"), schemeRe, "/").as("__d_npath"),
          col("pos").as("__d_pos"))
      // a position delete applies to data files with data seq <= its seq
      rows = rows.join(del,
        rows("__g_npath") === del("__d_npath") &&
          rows("__graft_pos") === del("__d_pos") &&
          lit(dseq) >= rows("__g_dseq"),
        "left_anti")
    }

    // equality deletes: resolve equality_ids to CURRENT logical names via
    // the schema's field ids, match with null-safe equality, gate with the
    // STRICT seq inequality (rows appended after the delete survive)
    val idToField: Map[Int, StructField] = schema.fields.flatMap(f =>
      if (f.metadata.contains("parquet.field.id"))
        Some(f.metadata.getLong("parquet.field.id").toInt -> f)
      else None).toMap
    val eqBySig = deletes.filter(_.content == 2)
      .groupBy(d => (d.equalityIds, d.seq)).toSeq
    eqBySig.foreach { case ((eqIds, dseq), dfs) =>
      val eqFields = eqIds.map(id => idToField.getOrElse(id,
        throw unsupported(s"equality delete on unknown field id $id", tablePath)))
      val del = spark.read.schema(StructType(eqFields.map(_.copy(nullable = true))))
        .parquet(dfs.map(d => toFsPath(d.path, tablePath).toString): _*)
        .toDF(eqFields.map(f => "__d_" + f.name): _*)
      val cond = eqFields.map(f =>
        rows(f.name) <=> del("__d_" + f.name)).reduce(_ && _) &&
        lit(dseq) > rows("__g_dseq")
      rows = rows.join(del, cond, "left_anti")
    }
    rows.drop("__g_npath", "__g_dseq")
  }

  /** Incremental append scan (the spec's "incremental read"): data files
    * ADDED by snapshots after `fromSnapshotId` (exclusive) through the
    * current snapshot. Snapshot ancestry comes from the metadata json's
    * ordered snapshots array; per snapshot, only manifests whose
    * `added_snapshot_id` matches are opened, and only status=ADDED entries
    * count — so consuming N new commits on a 100 TB table reads N commits'
    * worth of metadata, not the whole manifest forest. Snapshots whose
    * `summary.operation` is not "append" raise: after an overwrite/delete,
    * append-only consumption would serve wrong rows (Iceberg's own
    * incremental scan has the same restriction).
    */
  def readSince(spark: SparkSession, tablePath: String,
      fromSnapshotId: Long): DataFrame = {
    val (_, root) = currentMetadata(spark, tablePath)
    // schema + format checks; delete files present in the CURRENT snapshot
    // are safe to ignore here: the op-gate below raises for any non-append
    // snapshot after `from`, so surviving deletes all predate `from` and
    // can only target files added before it — never the appends served
    val (schema, _, _) = planFilesWithDeletes(spark, tablePath)
    val snapshots = Option(root.get("snapshots"))
      .map(arr => (0 until arr.size).map(arr.get)).getOrElse(Nil)
    val fromIdx = snapshots.indexWhere(
      _.get("snapshot-id").asLong == fromSnapshotId)
    if (fromIdx < 0)
      throw new IllegalArgumentException(
        s"snapshot $fromSnapshotId not in table history (expired?): $tablePath")
    val files = mutable.Buffer.empty[DataFileRef]
    snapshots.drop(fromIdx + 1).foreach { s =>
      val sid = s.get("snapshot-id").asLong
      val op = Option(s.get("summary")).flatMap(o => Option(o.get("operation")))
        .map(_.asText).getOrElse("append")
      if (op != "append")
        throw new IllegalStateException(
          s"snapshot $sid is '$op', not append: incremental read would be " +
            s"wrong — full-refresh from the snapshot instead ($tablePath)")
      val ml = toFsPath(s.get("manifest-list").asText, tablePath)
      readAvro(spark, ml)
        .filter(r => Option(r.get("added_snapshot_id"))
          .exists(_.toString.toLong == sid))
        .foreach { m =>
          readAvro(spark, toFsPath(m.get("manifest_path").toString, tablePath))
            .foreach { entry =>
              val status = Option(entry.get("status")).map(_.toString.toInt)
                .getOrElse(1)
              if (status == 1) { // ADDED in this snapshot
                val dfRec = entry.get("data_file").asInstanceOf[GenericRecord]
                files += DataFileRef(dfRec.get("file_path").toString,
                  dfRec.get("file_format").toString.toLowerCase,
                  Option(dfRec.get("record_count")).map(_.toString.toLong).getOrElse(0L),
                  Option(dfRec.get("file_size_in_bytes")).map(_.toString.toLong).getOrElse(0L))
              }
            }
        }
    }
    scanFiles(spark, tablePath, schema, files.toSeq)
  }

  // ------------------------------------------------------------ writer
  // Fixture-grade but spec-conformant v2 writer: enough of the format
  // (real Avro manifests + manifest lists, versioned metadata json,
  // version-hint) for the read path to be exercised end-to-end in a
  // connector-less container, and for the q112 oracle round trip.

  private val manifestEntrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int","field-id":134},
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"null_value_counts","type":["null",{"type":"array",
      |      "items":{"type":"record","name":"k121_v122","fields":[
      |        {"name":"key","type":"int","field-id":121},
      |        {"name":"value","type":"long","field-id":122}]},
      |      "logicalType":"map"}],"default":null,"field-id":110},
      |    {"name":"lower_bounds","type":["null",{"type":"array",
      |      "items":{"type":"record","name":"k126_v127","fields":[
      |        {"name":"key","type":"int","field-id":126},
      |        {"name":"value","type":"bytes","field-id":127}]},
      |      "logicalType":"map"}],"default":null,"field-id":125},
      |    {"name":"upper_bounds","type":["null",{"type":"array",
      |      "items":{"type":"record","name":"k129_v130","fields":[
      |        {"name":"key","type":"int","field-id":129},
      |        {"name":"value","type":"bytes","field-id":130}]},
      |      "logicalType":"map"}],"default":null,"field-id":128},
      |    {"name":"equality_ids","type":["null",{"type":"array",
      |      "items":"int","element-id":136}],"default":null,"field-id":135}
      |  ]},"field-id":2}
      |]}""".stripMargin)

  private val manifestFileSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"content","type":"int","field-id":517},
      |  {"name":"sequence_number","type":"long","default":0,"field-id":515},
      |  {"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin)

  /** Commit `df` as a new snapshot. Returns the snapshot id. */
  def write(df: DataFrame, tablePath: String, mode: String = "overwrite"): Long = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val meta = new Path(table, "metadata")
    val fs = table.getFileSystem(conf)
    fs.mkdirs(meta)
    fs.mkdirs(new Path(table, "data"))

    val priorPair = try Some(currentMetadata(spark, tablePath))
      catch { case _: IllegalArgumentException => None }
    val prior = priorPair.map(_._2)
    val verRe = "^v(\\d+)\\.metadata\\.json$".r
    val version = priorPair.map(_._1.getName) match {
      case Some(verRe(v)) => v.toInt + 1
      case _ => 1
    }
    val snapshotId = System.currentTimeMillis() * 1000 + version

    // stage data files, move under data/; derive per-file stats from the
    // footers just written (real record_count + column bounds)
    val tmp = new Path(table, s".graft_stage_${java.util.UUID.randomUUID}")
    // data files carry the schema's field ids (spec requirement; Spark
    // writes them from parquet.field.id metadata) so readers — ours and
    // foreign — can resolve renamed columns by id. The metadata must be
    // pinned at a LEAF (createDataFrame), not an alias: the optimizer
    // strips metadata-only Projects before the write (verified — .to()
    // loses the ids).
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(df.rdd, stampParquetIds(df.schema))
      .write.parquet(tmp.toString)
    val fieldIds = topLevelFieldIds(df.schema)
    // (path, bytes, rows, per-column raw stats)
    val dataFiles = mutable.Buffer.empty[(String, Long, Long, Map[String, DeltaStats.ColStats])]
    fs.listStatus(tmp).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val dest = new Path(table, s"data/${java.util.UUID.randomUUID}.parquet")
        fs.rename(st.getPath, dest)
        val (rows, byCol) =
          try DeltaStats.footerStats(conf, dest)
          catch { case scala.util.control.NonFatal(_) =>
            (0L, Map.empty[String, DeltaStats.ColStats]) }
        dataFiles += ((dest.toString, st.getLen, rows, byCol))
      }
    fs.delete(tmp, true)

    // one manifest for this commit's files, with Appendix-D-encoded bounds
    val dataFileAvro = manifestEntrySchema.getField("data_file").schema()
    def kvArraySchema(field: String) =
      dataFileAvro.getField(field).schema().getTypes.get(1)
    val manifestPath = new Path(meta, s"manifest-$snapshotId.avro")
    writeAvro(spark, manifestPath, manifestEntrySchema, dataFiles.toSeq.map {
      case (p, bytes, rows, byCol) =>
        val e = new GenericData.Record(manifestEntrySchema)
        e.put("status", 1)
        val d = new GenericData.Record(dataFileAvro)
        d.put("content", 0); d.put("file_path", p)
        d.put("file_format", "PARQUET"); d.put("record_count", rows)
        d.put("file_size_in_bytes", bytes)
        def kvRecords(field: String)(value: (StructField, DeltaStats.ColStats) => Option[Any])
            : java.util.List[GenericRecord] = {
          val arrSchema = kvArraySchema(field)
          val itemSchema = arrSchema.getElementType
          val out = new java.util.ArrayList[GenericRecord]()
          df.schema.fields.foreach { f =>
            for (id <- fieldIds.get(f.name); cs <- byCol.get(f.name);
                 v <- value(f, cs)) {
              val r = new GenericData.Record(itemSchema)
              r.put("key", id); r.put("value", v)
              out.add(r)
            }
          }
          out
        }
        val lowers = kvRecords("lower_bounds")((f, cs) =>
          encodeBound(cs.min, f.dataType).map(java.nio.ByteBuffer.wrap))
        val uppers = kvRecords("upper_bounds")((f, cs) =>
          encodeBound(cs.max, f.dataType).map(java.nio.ByteBuffer.wrap))
        val nvc = kvRecords("null_value_counts")((_, cs) =>
          cs.nullCount.map(n => java.lang.Long.valueOf(n)))
        if (!lowers.isEmpty) d.put("lower_bounds", lowers)
        if (!uppers.isEmpty) d.put("upper_bounds", uppers)
        if (!nvc.isEmpty) d.put("null_value_counts", nvc)
        e.put("data_file", d)
        e
    })

    // manifest list = prior manifests (append) or just this one (overwrite).
    // Each prior manifest keeps its ORIGINAL added_snapshot_id (spec: the
    // snapshot that first listed it) — that provenance is what makes the
    // incremental scan ([[readSince]]) able to attribute files to commits —
    // plus its original content (a DELETE manifest stays one) and sequence
    // number (what gates delete applicability).
    val priorManifests: Seq[ManifestRef] =
      if (mode == "overwrite") Nil else priorManifestRefs(spark, tablePath, prior)
    val mlPath = new Path(meta, s"snap-$snapshotId.avro")
    val mLen = fs.getFileStatus(manifestPath).getLen
    writeManifestList(spark, mlPath,
      ManifestRef(manifestPath.toString, mLen, 0, version.toLong, snapshotId) +:
        priorManifests)

    // versioned metadata json + version hint
    val rootNode = mapper.createObjectNode()
    rootNode.put("format-version", 2)
    rootNode.put("table-uuid", java.util.UUID.randomUUID.toString)
    rootNode.put("location", tablePath)
    rootNode.put("last-sequence-number", version)
    rootNode.put("last-updated-ms", System.currentTimeMillis())
    rootNode.put("last-column-id", df.schema.size)
    rootNode.put("current-schema-id", 0)
    val schemas = rootNode.putArray("schemas")
    schemas.add(sparkSchemaToIceberg(df.schema))
    rootNode.putArray("partition-specs").addObject()
      .put("spec-id", 0).putArray("fields")
    rootNode.put("default-spec-id", 0)
    rootNode.put("current-snapshot-id", snapshotId)
    val snapsArr = rootNode.putArray("snapshots")
    // keep prior snapshots readable for snapshotAsOf time travel
    prior.foreach { p =>
      Option(p.get("snapshots")).foreach { arr =>
        (0 until arr.size).foreach(i => snapsArr.add(arr.get(i)))
      }
    }
    val snapNode = snapsArr.addObject()
    snapNode.put("snapshot-id", snapshotId)
    snapNode.put("sequence-number", version.toLong)
    snapNode.put("timestamp-ms", System.currentTimeMillis())
    snapNode.put("manifest-list", mlPath.toString)
    snapNode.putObject("summary").put("operation",
      if (mode == "overwrite") "overwrite" else "append")

    val mf = new Path(meta, s"v$version.metadata.json")
    val out = fs.create(mf, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(rootNode).getBytes("UTF-8"))
    finally out.close()
    val hint = fs.create(new Path(meta, "version-hint.text"), true)
    try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
    snapshotId
  }

  // --------------------------------------------------- v2 delete writers

  private[io] final case class ManifestRef(path: String, length: Long,
      content: Int, seq: Long, addedBy: Long)

  /** The current snapshot's manifest-list entries with their ORIGINAL
    * content (a delete manifest stays one), sequence number (what gates
    * delete applicability) and added-by provenance preserved.
    */
  private def priorManifestRefs(spark: SparkSession, tablePath: String,
      prior: Option[JsonNode]): Seq[ManifestRef] =
    prior.toSeq.flatMap { p =>
      val curId = Option(p.get("current-snapshot-id")).map(_.asLong)
      val snaps = Option(p.get("snapshots"))
        .map(arr => (0 until arr.size).map(arr.get)).getOrElse(Nil)
      snaps.filter(s => curId.contains(s.get("snapshot-id").asLong))
        .flatMap { s =>
          readAvro(spark, toFsPath(s.get("manifest-list").asText, tablePath))
            .map(r => ManifestRef(r.get("manifest_path").toString,
              r.get("manifest_length").toString.toLong,
              optAvro(r, "content").map(_.toString.toInt).getOrElse(0),
              optAvro(r, "sequence_number").map(_.toString.toLong).getOrElse(0L),
              optAvro(r, "added_snapshot_id").map(_.toString.toLong)
                .getOrElse(s.get("snapshot-id").asLong)))
        }
    }

  private def writeManifestList(spark: SparkSession, mlPath: Path,
      refs: Seq[ManifestRef]): Unit =
    writeAvro(spark, mlPath, manifestFileSchema, refs.map { m =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", m.path); r.put("manifest_length", m.length)
      r.put("partition_spec_id", 0); r.put("content", m.content)
      r.put("sequence_number", m.seq)
      r.put("added_snapshot_id", m.addedBy)
      r
    })

  /** Row-level DELETE via a v2 POSITION delete file (spec "Position Delete
    * Files"): matched rows are recorded as sorted `(file_path, pos)` pairs
    * — cost proportional to matched ROWS, zero data files rewritten — the
    * Iceberg-native analog of Delta's deletion vectors. One delete
    * manifest + one snapshot commit. Returns the snapshot id (or the
    * current one unchanged when nothing matches).
    */
  def deleteWhere(spark: SparkSession, tablePath: String,
      condition: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    val (schema, files, deletes) = planFilesWithDeletes(spark, tablePath)
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    // the delete file must record the MANIFEST's file_path spelling (what
    // foreign readers key on), not the scanned URI — map back with a
    // broadcast (normalized scanned path -> manifest path) frame
    val pathMap = spark.createDataFrame(files.map(f =>
      (normPath(toFsPath(f.path, tablePath).toString), f.path)))
      .toDF("__m_npath", "__m_path")
    val scan = scanFiles(spark, tablePath, schema, files, deletes,
      withMeta = true)
    val tmp = new Path(table, s".graft_del_${java.util.UUID.randomUUID}")
    scan.filter(condition)
      .withColumn("__g_npath",
        regexp_replace(col("__graft_path"), schemeRe, "/"))
      .join(broadcast(pathMap), col("__g_npath") === col("__m_npath"))
      .select(col("__m_path").as("file_path"), col("__graft_pos").as("pos"))
      .sort("file_path", "pos") // spec: position deletes sorted (path, pos)
      .write.parquet(tmp.toString)
    val staged = moveDeleteParts(fs, table, tmp, conf)
    if (staged.isEmpty)
      return Option(currentMetadata(spark, tablePath)._2
        .get("current-snapshot-id")).map(_.asLong).getOrElse(-1L)
    commitDelete(spark, tablePath, staged, content = 1, equalityIds = Nil)
  }

  /** Row-level DELETE via a v2 EQUALITY delete file (spec "Equality Delete
    * Files"): the distinct `values` rows over `cols` are written ONCE, and
    * any data row equal to a delete row (null-safe) whose data sequence
    * number STRICTLY precedes this commit is excluded at read time — O(
    * delete keys) bytes, applying to every earlier file without locating
    * them (the upsert/CDC primitive). Rows appended later survive, even if
    * equal. Returns the snapshot id.
    */
  def deleteWhereEquality(spark: SparkSession, tablePath: String,
      cols: Seq[String], values: DataFrame): Long = {
    val (schema, _, _) = planFilesWithDeletes(spark, tablePath)
    val eqFields = cols.map(c => schema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no column '$c' in $tablePath")))
    val eqIds = eqFields.map(f =>
      if (f.metadata.contains("parquet.field.id"))
        f.metadata.getLong("parquet.field.id").toInt
      else throw unsupported(
        s"equality delete on id-less column '${f.name}'", tablePath))
    val spark2 = values.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    // the delete file carries the schema's field ids so it keeps resolving
    // after future renames, exactly like a data file
    spark2.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val keyDf = values.selectExpr(cols: _*).dropDuplicates()
    val tmp = new Path(table, s".graft_del_${java.util.UUID.randomUUID}")
    spark2.createDataFrame(keyDf.rdd,
      StructType(eqFields.map(_.copy(nullable = true))))
      .write.parquet(tmp.toString)
    val staged = moveDeleteParts(fs, table, tmp, conf)
    commitDelete(spark, tablePath, staged, content = 2, equalityIds = eqIds)
  }

  /** Move staged delete part files under data/ and return
    * (manifest path, bytes, rows) per file.
    */
  private def moveDeleteParts(fs: org.apache.hadoop.fs.FileSystem,
      table: Path, tmp: Path,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long, Long)] = {
    val out = mutable.Buffer.empty[(String, Long, Long)]
    fs.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val dest = new Path(table, s"data/delete-${java.util.UUID.randomUUID}.parquet")
        fs.rename(st.getPath, dest)
        val rows =
          try DeltaStats.footerStats(conf, dest)._1
          catch { case scala.util.control.NonFatal(_) => 0L }
        if (rows > 0) out += ((dest.toString, st.getLen, rows))
        else fs.delete(dest, false) // an empty part file deletes nothing
      }
    fs.delete(tmp, true)
    out.toSeq
  }

  /** Shared delete-commit machinery: one delete MANIFEST listing
    * `deleteFiles`, then a snapshot whose manifest list prepends it to the
    * prior manifests (original content/seq preserved). The new sequence
    * number is last-sequence-number + 1 — data files keep theirs, which is
    * exactly what the read-side applicability gates compare against.
    */
  private def commitDelete(spark: SparkSession, tablePath: String,
      deleteFiles: Seq[(String, Long, Long)], content: Int,
      equalityIds: Seq[Int]): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val meta = new Path(table, "metadata")
    val fs = table.getFileSystem(conf)
    val (metaFile, root) = currentMetadata(spark, tablePath)
    val verRe = "^v(\\d+)\\.metadata\\.json$".r
    val version = metaFile.getName match {
      case verRe(v) => v.toInt + 1
      case _ => throw new IllegalArgumentException(
        s"unversioned metadata file ${metaFile.getName}: $tablePath")
    }
    val seq = Option(root.get("last-sequence-number")).map(_.asLong + 1)
      .getOrElse(version.toLong)
    val snapshotId = System.currentTimeMillis() * 1000 + version

    val dataFileAvro = manifestEntrySchema.getField("data_file").schema()
    val manifestPath = new Path(meta, s"manifest-$snapshotId.avro")
    writeAvro(spark, manifestPath, manifestEntrySchema, deleteFiles.map {
      case (p, bytes, rows) =>
        val e = new GenericData.Record(manifestEntrySchema)
        e.put("status", 1)
        val d = new GenericData.Record(dataFileAvro)
        d.put("content", content); d.put("file_path", p)
        d.put("file_format", "PARQUET"); d.put("record_count", rows)
        d.put("file_size_in_bytes", bytes)
        if (equalityIds.nonEmpty) {
          val l = new java.util.ArrayList[Integer]()
          equalityIds.foreach(i => l.add(Integer.valueOf(i)))
          d.put("equality_ids", l)
        }
        e.put("data_file", d)
        e
    })
    val mLen = fs.getFileStatus(manifestPath).getLen
    val mlPath = new Path(meta, s"snap-$snapshotId.avro")
    writeManifestList(spark, mlPath,
      ManifestRef(manifestPath.toString, mLen, content, seq, snapshotId) +:
        priorManifestRefs(spark, tablePath, Some(root)))

    val rootObj = root.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    rootObj.put("last-sequence-number", seq)
    rootObj.put("last-updated-ms", System.currentTimeMillis())
    rootObj.put("current-snapshot-id", snapshotId)
    val snapsArr = rootObj.get("snapshots") match {
      case a: com.fasterxml.jackson.databind.node.ArrayNode => a
      case _ => rootObj.putArray("snapshots")
    }
    val snapNode = snapsArr.addObject()
    snapNode.put("snapshot-id", snapshotId)
    snapNode.put("sequence-number", seq)
    snapNode.put("timestamp-ms", System.currentTimeMillis())
    snapNode.put("manifest-list", mlPath.toString)
    snapNode.putObject("summary").put("operation", "delete")
    val mf = new Path(meta, s"v$version.metadata.json")
    val out = fs.create(mf, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(rootObj).getBytes("UTF-8"))
    finally out.close()
    val hint = fs.create(new Path(meta, "version-hint.text"), true)
    try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
    snapshotId
  }

  // ------------------------------------------------------------ helpers

  /** Avro's GenericRecord.get THROWS on a field the writer schema lacks
    * (older manifests predate sequence_number/equality_ids) — probe the
    * schema first.
    */
  private def optAvro(r: GenericRecord, name: String): Option[AnyRef] =
    if (r.getSchema.getField(name) == null) None else Option(r.get(name))

  private[graft] def readAvro(spark: SparkSession, path: Path): Seq[GenericRecord] = {
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(path)
    val stream = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val b = Seq.newBuilder[GenericRecord]
      while (stream.hasNext) b += stream.next()
      b.result()
    } finally stream.close()
  }

  private[graft] def writeAvro(spark: SparkSession, path: Path,
      schema: org.apache.avro.Schema, records: Seq[GenericRecord]): Unit = {
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(path, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
  }

  /** Manifest paths are absolute URIs; map file:/ URIs onto the table's
    * filesystem and pass others through.
    */
  private def toFsPath(uri: String, tablePath: String): Path = {
    val u = java.net.URI.create(uri.replace(" ", "%20"))
    if (u.getScheme == null) new Path(new Path(tablePath), uri)
    else new Path(u)
  }

  private def unsupported(what: String, tablePath: String) =
    new UnsupportedOperationException(
      s"Iceberg table $tablePath uses $what, which the native reader does " +
        "not support; add the org.apache.iceberg connector jar to read it " +
        "(Sources.lakehouseAvailable prefers the connector automatically)")

  /** Iceberg schema JSON → Spark StructType (name-based; spec "Schemas"). */
  private[graft] def icebergSchemaToSpark(node: JsonNode): StructType = {
    def convert(t: JsonNode): DataType =
      if (t.isTextual) primitive(t.asText)
      else t.get("type").asText match {
        case "struct" =>
          StructType(jsonSeq(t.get("fields")).map { f =>
            // carry the Iceberg field id as parquet.field.id metadata: the
            // spec resolves columns by ID, not name, and Spark's parquet
            // reader honors exactly this metadata key when field-id
            // resolution is enabled — renamed columns keep reading
            val mb = new MetadataBuilder()
            Option(f.get("id")).foreach(id =>
              mb.putLong("parquet.field.id", id.asLong))
            StructField(f.get("name").asText, convert(f.get("type")),
              nullable = !Option(f.get("required")).exists(_.asBoolean),
              mb.build())
          })
        case "list" =>
          ArrayType(convert(t.get("element")),
            containsNull = !Option(t.get("element-required")).exists(_.asBoolean))
        case "map" =>
          MapType(convert(t.get("key")), convert(t.get("value")),
            valueContainsNull =
              !Option(t.get("value-required")).exists(_.asBoolean))
        case other => throw new IllegalArgumentException(
          s"unsupported Iceberg type: $other")
      }
    def primitive(s: String): DataType = s match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" | "uuid" => StringType
      case "binary" => BinaryType
      case f if f.startsWith("fixed") => BinaryType
      case d if d.startsWith("decimal") =>
        val Array(p, sc) = d.stripPrefix("decimal(").stripSuffix(")").split(",")
        DecimalType(p.trim.toInt, sc.trim.toInt)
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg primitive: $other")
    }
    convert(node).asInstanceOf[StructType]
  }

  /** Spark StructType → Iceberg schema JSON (ids assigned depth-first). */
  private[graft] def sparkSchemaToIceberg(schema: StructType): JsonNode = {
    var nextId = 0
    def id(): Int = { nextId += 1; nextId }
    def typeNode(dt: DataType): Either[String, com.fasterxml.jackson.databind.node.ObjectNode] =
      dt match {
        case BooleanType => Left("boolean")
        case IntegerType | ShortType | ByteType => Left("int")
        case LongType => Left("long")
        case FloatType => Left("float")
        case DoubleType => Left("double")
        case DateType => Left("date")
        case TimestampNTZType => Left("timestamp")
        case TimestampType => Left("timestamptz")
        case StringType => Left("string")
        case BinaryType => Left("binary")
        case d: DecimalType => Left(s"decimal(${d.precision}, ${d.scale})")
        case st: StructType =>
          val o = mapper.createObjectNode()
          o.put("type", "struct")
          val fields = o.putArray("fields")
          st.fields.foreach { f =>
            val fo = fields.addObject()
            fo.put("id", id()); fo.put("name", f.name)
            fo.put("required", !f.nullable)
            typeNode(f.dataType) match {
              case Left(s) => fo.put("type", s)
              case Right(n) => fo.set[JsonNode]("type", n)
            }
          }
          Right(o)
        case at: ArrayType =>
          val o = mapper.createObjectNode()
          o.put("type", "list"); o.put("element-id", id())
          o.put("element-required", !at.containsNull)
          typeNode(at.elementType) match {
            case Left(s) => o.put("element", s)
            case Right(n) => o.set[JsonNode]("element", n)
          }
          Right(o)
        case mt: MapType =>
          val o = mapper.createObjectNode()
          o.put("type", "map")
          o.put("key-id", id()); o.put("value-id", id())
          o.put("value-required", !mt.valueContainsNull)
          typeNode(mt.keyType) match {
            case Left(s) => o.put("key", s)
            case Right(n) => o.set[JsonNode]("key", n)
          }
          typeNode(mt.valueType) match {
            case Left(s) => o.put("value", s)
            case Right(n) => o.set[JsonNode]("value", n)
          }
          Right(o)
        case other => throw new IllegalArgumentException(
          s"unsupported type for Iceberg metadata: $other")
      }
    val root = typeNode(schema).toOption.get
    root.put("schema-id", 0)
    root
  }

  private def jsonSeq(n: JsonNode): Seq[JsonNode] =
    if (n == null || !n.isArray) Nil else (0 until n.size).map(n.get)

  /** Does the parquet footer carry field ids? (one cheap driver-side open) */
  private def fileHasFieldIds(conf: org.apache.hadoop.conf.Configuration,
      path: Path): Boolean =
    try {
      val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
      try fr.getFooter.getFileMetaData.getSchema.getFields.asScala
        .exists(_.getId != null)
      finally fr.close()
    } catch { case scala.util.control.NonFatal(_) => false }

  private def stripParquetIds(schema: StructType): StructType = {
    def conv(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = conv(f.dataType), metadata = new MetadataBuilder()
          .withMetadata(f.metadata).remove("parquet.field.id").build())))
      case at: ArrayType => at.copy(elementType = conv(at.elementType))
      case mt: MapType =>
        mt.copy(keyType = conv(mt.keyType), valueType = conv(mt.valueType))
      case o => o
    }
    conv(schema).asInstanceOf[StructType]
  }

  /** Stamp `parquet.field.id` metadata matching EXACTLY the depth-first id
    * assignment [[sparkSchemaToIceberg]] performs, so the data files the
    * writer emits resolve by id like any real Iceberg writer's.
    */
  private[graft] def stampParquetIds(schema: StructType): StructType = {
    var next = 0
    def id(): Int = { next += 1; next }
    def conv(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val fid = id()
        val inner = conv(f.dataType)
        f.copy(dataType = inner, metadata = new MetadataBuilder()
          .withMetadata(f.metadata).putLong("parquet.field.id", fid.toLong)
          .build())
      })
      case at: ArrayType => { id(); at.copy(elementType = conv(at.elementType)) }
      case mt: MapType =>
        { id(); id()
          mt.copy(keyType = conv(mt.keyType), valueType = conv(mt.valueType)) }
      case o => o
    }
    conv(schema).asInstanceOf[StructType]
  }

  /** ALTER TABLE ... RENAME COLUMN, Iceberg-style: a new metadata json
    * version whose current schema renames the field IN PLACE (same field
    * id — the spec's whole point: names are metadata, ids are identity).
    * Data files, manifests and snapshots are untouched; reads resolve the
    * renamed column through parquet field ids.
    */
  def renameColumn(spark: SparkSession, tablePath: String,
      oldName: String, newName: String): Unit = {
    val (metaFile, root) = currentMetadata(spark, tablePath)
    val schemasNode = Option(root.get("schemas"))
      .filter(_.isArray).getOrElse(throw new IllegalArgumentException(
        s"v1 single-schema metadata rename not supported: $tablePath"))
    val curId = Option(root.get("current-schema-id")).map(_.asLong).getOrElse(0L)
    val cur = (0 until schemasNode.size).map(schemasNode.get)
      .find(s => Option(s.get("schema-id")).exists(_.asLong == curId))
      .getOrElse(throw new IllegalArgumentException(
        s"current schema $curId not found: $tablePath"))
    val fields = jsonSeq(cur.get("fields"))
    require(fields.exists(_.get("name").asText == oldName),
      s"no column '$oldName' in $tablePath")
    require(!fields.exists(_.get("name").asText == newName),
      s"column '$newName' already exists in $tablePath")
    fields.find(_.get("name").asText == oldName).foreach {
      case o: com.fasterxml.jackson.databind.node.ObjectNode =>
        o.put("name", newName)
      case _ =>
    }
    val verRe = "^v(\\d+)\\.metadata\\.json$".r
    val version = metaFile.getName match {
      case verRe(v) => v.toInt + 1
      case _ => throw new IllegalArgumentException(
        s"unversioned metadata file ${metaFile.getName}: $tablePath")
    }
    val meta = new Path(tablePath, "metadata")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    val mf = new Path(meta, s"v$version.metadata.json")
    val out = fs.create(mf, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    val hint = fs.create(new Path(meta, "version-hint.text"), true)
    try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
  }

  /** Top-level column name -> Iceberg field id, mirroring EXACTLY the
    * depth-first id assignment [[sparkSchemaToIceberg]] performs (each
    * field takes the next id, then its nested types consume theirs).
    */
  private[graft] def topLevelFieldIds(schema: StructType): Map[String, Int] = {
    def idSpan(dt: DataType): Int = dt match {
      case st: StructType => st.fields.map(f => 1 + idSpan(f.dataType)).sum
      case at: ArrayType => 1 + idSpan(at.elementType)
      case mt: MapType => 2 + idSpan(mt.keyType) + idSpan(mt.valueType)
      case _ => 0
    }
    var next = 0
    schema.fields.map { f =>
      next += 1
      val myId = next
      next += idSpan(f.dataType)
      f.name -> myId
    }.toMap
  }

  /** Parquet-physical footer value → Iceberg binary single-value (spec
    * Appendix D, little-endian). None for types we don't encode (nested,
    * decimal, binary, NaN/Inf floats, strings > 64 bytes — parquet may
    * truncate long binary stats, and omitted bounds are always safe).
    */
  private[graft] def encodeBound(v: Any, dt: DataType): Option[Array[Byte]] = {
    def le(n: Int) = java.nio.ByteBuffer.allocate(n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (v, dt) match {
      case (i: java.lang.Integer, ByteType | ShortType | IntegerType | DateType) =>
        Some(le(4).putInt(i.intValue).array)
      case (l: java.lang.Long, LongType | TimestampType | TimestampNTZType) =>
        Some(le(8).putLong(l.longValue).array)
      case (f: java.lang.Float, FloatType) if !f.isNaN && !f.isInfinite =>
        Some(le(4).putFloat(f.floatValue).array)
      case (d: java.lang.Double, DoubleType) if !d.isNaN && !d.isInfinite =>
        Some(le(8).putDouble(d.doubleValue).array)
      case (b: java.lang.Boolean, BooleanType) =>
        Some(Array[Byte](if (b.booleanValue) 1 else 0))
      case (b: org.apache.parquet.io.api.Binary, StringType) =>
        Some(b.getBytes).filter(_.length <= 64)
      case _ => None
    }
  }
}
