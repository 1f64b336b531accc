package graft.io

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** The store-agnostic half of the from-scratch object-store tier (r16):
  * one Hadoop `FileSystem` implementation over a minimal flat-keyspace
  * client interface, shared by the S3/GCS (SigV4 — [[S3LiteClient]]) and
  * Azure Blob (SharedKey — [[AzureBlobClient]]) protocol clients. The
  * semantics all real object stores share — flat keys, implicit
  * directories plus zero-byte `dir/` markers, copy+delete renames, paged
  * listings — live here once; each protocol contributes only its REST
  * dialect and signature scheme.
  */
/** HTTP/XML helpers shared by the protocol clients — the error-stream
  * drain rule and entity unescape order are correctness-sensitive and live
  * here once.
  */
private[io] object ObjectHttp {
  def drainAndClose(conn: java.net.HttpURLConnection): Unit = {
    val s = if (conn.getResponseCode >= 400) conn.getErrorStream
      else conn.getInputStream
    if (s != null) { while (s.read() >= 0) {}; s.close() }
  }

  def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
}

private[io] trait ObjectClient {
  /** Some(length) when the object exists. */
  def head(key: String): Option[Long]
  /** Ranged stream from byte `from` (inclusive) to the end. */
  def getRange(key: String, from: Long): InputStream
  def put(key: String, data: Array[Byte]): Unit
  /** Server-side copy within the store. */
  def copy(srcKey: String, dstKey: String): Unit
  def delete(key: String): Unit
  /** (keys+sizes, commonPrefixes) under `prefix`; a non-empty `delimiter`
    * groups deeper keys into common prefixes. Implementations follow their
    * protocol's pagination to completion.
    */
  def list(prefix: String, delimiter: String): (Seq[(String, Long)], Seq[String])

  // ---- multipart upload (r17; optional) ----
  /** Some(uploadId) when the store supports multipart uploads for this key;
    * None → the FileSystem falls back to buffer-whole-object + single PUT.
    */
  def createMultipart(key: String): Option[String] = None
  /** Upload one part (1-based part numbers) → its ETag. */
  def uploadPart(key: String, uploadId: String, partNumber: Int,
      data: Array[Byte]): String =
    throw new UnsupportedOperationException("multipart upload unsupported")
  /** Assemble the uploaded parts into the final object. */
  def completeMultipart(key: String, uploadId: String,
      parts: Seq[(Int, String)]): Unit =
    throw new UnsupportedOperationException("multipart upload unsupported")
  /** Drop a failed upload's parts (best-effort). */
  def abortMultipart(key: String, uploadId: String): Unit = ()
}

/** Flat-keyspace object store presented as a Hadoop FileSystem: the URI
  * authority scopes the keyspace (S3 bucket / Azure container@account),
  * directories are S3-style (implicit prefixes + zero-byte `dir/` markers
  * so empty directories survive the Spark committer's mkdirs/rename dance),
  * and rename is copy+delete honoring Hadoop's rename-into-existing-dir
  * contract.
  */
abstract class ObjectFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var workingDir: Path = _
  protected var client: ObjectClient = _

  /** Build the protocol client for this authority from the Hadoop conf. */
  protected def makeClient(conf: Configuration, authority: String): ObjectClient

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    client = makeClient(conf, name.getAuthority)
    workingDir = new Path(s"${name.getScheme}://${name.getAuthority}/")
  }

  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }

  private def key(p: Path): String = {
    val raw = p.toUri.getPath
    if (raw == null || raw.isEmpty) "" else raw.stripPrefix("/")
  }
  private def base: String = s"${fsUri.getScheme}://${fsUri.getAuthority}/"

  override def getFileStatus(p: Path): FileStatus = {
    val k = key(p)
    if (k.isEmpty)
      return new FileStatus(0, true, 1, 0, 0, p)
    client.head(k) match {
      case Some(len) =>
        new FileStatus(len, false, 1, 32 * 1024 * 1024, 0, p)
      case None =>
        if (client.head(k + "/").isDefined)
          new FileStatus(0, true, 1, 0, 0, p)
        else {
          val (contents, cps) = client.list(k + "/", "/")
          if (contents.nonEmpty || cps.nonEmpty)
            new FileStatus(0, true, 1, 0, 0, p)
          else throw new java.io.FileNotFoundException(p.toString)
        }
    }
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val k = key(p)
    if (k.nonEmpty && client.head(k).isDefined)
      return Array(getFileStatus(p))
    val prefix = if (k.isEmpty) "" else k + "/"
    val (contents, cps) = client.list(prefix, "/")
    val files = contents.filterNot(_._1 == prefix).map { case (ck, len) =>
      new FileStatus(len, ck.endsWith("/"), 1, 32 * 1024 * 1024, 0,
        new Path(base + ck.stripSuffix("/")))
    }
    val dirs = cps.map(cp =>
      new FileStatus(0, true, 1, 0, 0, new Path(base + cp.stripSuffix("/"))))
    if (files.isEmpty && dirs.isEmpty && k.nonEmpty &&
        client.head(prefix).isEmpty)
      throw new java.io.FileNotFoundException(p.toString)
    (files ++ dirs).toArray
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val st = getFileStatus(p)
    if (st.isDirectory)
      throw new java.io.FileNotFoundException(s"$p is a directory")
    new FSDataInputStream(new ObjectInputStream(client, key(p), st.getLen))
  }

  /** Part size for streaming writes; Long.MaxValue = multipart disabled
    * (buffer whole object, single PUT). Stores with a multipart protocol
    * override this from their conf — real S3 caps a single PUT at 5 GB, so
    * a task output beyond one part MUST stream as multipart, and rolling
    * parts out as they fill keeps the writer's memory at one part instead
    * of the whole object.
    */
  protected def multipartPartSize(conf: Configuration): Long = Long.MaxValue

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    if (!overwrite && client.head(k).isDefined)
      throw new java.io.IOException(s"$p already exists")
    new FSDataOutputStream(
      new ObjectWriteStream(client, k, multipartPartSize(getConf)), statistics)
  }

  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("objects are immutable")

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    val k = key(p)
    if (k.nonEmpty) client.put(k + "/", Array.empty)
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = key(p)
    if (client.head(k).isDefined) { client.delete(k); true }
    else {
      val (contents, _) = client.list(k + "/", "")
      if (contents.isEmpty && client.head(k + "/").isEmpty) false
      else {
        // the directory's own zero-byte marker is not "content" — an empty
        // directory deletes non-recursively per the FileSystem contract
        val nonMarker = contents.filterNot(_._1 == k + "/")
        if (nonMarker.nonEmpty && !recursive)
          throw new java.io.IOException(s"$p is a non-empty directory")
        contents.foreach { case (ck, _) => client.delete(ck) }
        client.delete(k + "/")
        true
      }
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    val dkRaw = key(dst)
    // Hadoop contract: renaming into an existing directory moves src UNDER it
    val dstIsDir =
      try getFileStatus(dst).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    val dk = if (dstIsDir) s"$dkRaw/${src.getName}".stripPrefix("/") else dkRaw
    if (client.head(sk).isDefined) {
      client.copy(sk, dk)
      client.delete(sk)
      true
    } else {
      val (contents, _) = client.list(sk + "/", "")
      if (contents.isEmpty && client.head(sk + "/").isEmpty) false
      else {
        contents.foreach { case (ck, _) =>
          val suffix = ck.stripPrefix(sk + "/")
          client.copy(ck, s"$dk/$suffix")
          client.delete(ck)
        }
        client.delete(sk + "/")
        client.put(dk + "/", Array.empty)
        true
      }
    }
  }
}

/** Object writer: buffers at most ONE part. Writes under `partSize` close
  * as a plain single PUT (the cheap, dominant case — Spark part files are
  * usually well under the part size); the first buffer overflow opens a
  * multipart upload and each full part ships immediately, so memory stays
  * O(partSize) however large the object grows. A store without multipart
  * (createMultipart → None) degrades to the pre-r17 buffer-and-PUT path.
  * Close completes the upload or aborts it on failure (no orphaned parts).
  */
private[io] final class ObjectWriteStream(client: ObjectClient, key: String,
    partSize: Long) extends OutputStream {
  private val buf = new ByteArrayOutputStream()
  private var uploadId: Option[String] = None
  private var noMultipart = false
  private var partNum = 0
  private val etags = Seq.newBuilder[(Int, String)]
  private var closed = false

  private def rollPart(): Unit = {
    if (uploadId.isEmpty && !noMultipart) {
      uploadId = client.createMultipart(key)
      if (uploadId.isEmpty) noMultipart = true
    }
    uploadId.foreach { id =>
      partNum += 1
      etags += ((partNum, client.uploadPart(key, id, partNum, buf.toByteArray)))
      buf.reset()
    }
  }
  private def maybeRoll(): Unit = if (buf.size >= partSize) rollPart()

  override def write(b: Int): Unit = { buf.write(b); maybeRoll() }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    // chunk the input so the buffer never exceeds one part — a single
    // large write must still produce partSize-bounded parts
    var o = off; var rem = len
    while (rem > 0) {
      val room = math.min(partSize - buf.size, rem.toLong).toInt
      val n = math.max(room, 1)
      buf.write(b, o, n); o += n; rem -= n
      maybeRoll()
    }
  }
  override def close(): Unit = if (!closed) {
    closed = true
    uploadId match {
      case None => client.put(key, buf.toByteArray)
      case Some(id) =>
        try {
          if (buf.size > 0) rollPart() // final part (may be under the min)
          client.completeMultipart(key, id, etags.result())
        } catch {
          case e: Throwable =>
            try client.abortMultipart(key, id) catch { case _: Throwable => }
            throw e
        }
    }
  }
}

/** Seekable ranged-GET input stream (each seek re-opens from the new
  * position; positioned reads come through FSInputStream's default
  * seek/read/seek-back).
  */
private[io] final class ObjectInputStream(client: ObjectClient, key: String,
    length: Long) extends FSInputStream {
  private var pos = 0L
  private var in: InputStream = _

  private def ensure(): Boolean = {
    if (pos >= length) false
    else { if (in == null) in = client.getRange(key, pos); true }
  }
  private def dropStream(): Unit = { if (in != null) { in.close(); in = null } }

  override def seek(newPos: Long): Unit =
    if (newPos != pos) { dropStream(); pos = newPos }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    if (!ensure()) return -1
    val b = in.read()
    if (b >= 0) pos += 1 else dropStream()
    b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (!ensure()) return -1
    val n = in.read(b, off, len)
    if (n > 0) pos += n else dropStream()
    n
  }
  override def close(): Unit = dropStream()
}
