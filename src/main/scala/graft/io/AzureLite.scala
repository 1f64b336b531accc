package graft.io

import java.io.InputStream
import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.concurrent.ConcurrentHashMap
import java.util.{Base64, Locale}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration

/** A from-scratch Azure Blob Storage protocol stack (r16) — the third leg
  * of the reference's object-store tier (`azureBlobStorage()` — reference
  * table_functions.py:411-466: connection_string + container + path), built
  * like the S3 half: the PUBLIC protocol (Blob REST API + SharedKey
  * authorization exactly as published) is the interface.
  *
  *  - [[AzureSharedKey]] — the SharedKey string-to-sign (the 2015-02-21+
  *    canonicalization: standard-header slots, sorted x-ms-* headers,
  *    /account-prefixed canonicalized resource with sorted query params)
  *    and its HMAC-SHA256-over-base64-key signature; used by the client to
  *    SIGN and by [[AzureLiteServer]] to VERIFY every request.
  *  - [[AzureBlobClient]] — Get/Put/Delete Blob, Copy Blob, List Blobs
  *    (with prefix/delimiter/marker pagination) as an [[ObjectClient]], so
  *    the shared [[ObjectFileSystem]] serves `wasb://container@account/...`
  *    through the standard Spark readers/writers.
  *  - [[AzureLiteServer]] — loopback Blob endpoint (in-memory blobs) for
  *    live round trips; rejects bad signatures with 403.
  */
object AzureSharedKey {
  private val rfc1123 = DateTimeFormatter
    .ofPattern("EEE, dd MMM yyyy HH:mm:ss 'GMT'", Locale.US)
    .withZone(ZoneOffset.UTC)

  def msDate(now: Instant): String = rfc1123.format(now)

  /** The published SharedKey (not SharedKeyLite) string-to-sign for the
    * Blob service. `headers` are the request's headers (the x-ms-* subset
    * is canonicalized; the named standard slots are read from it);
    * `query` holds DECODED query parameters.
    */
  def stringToSign(method: String, account: String, path: String,
      query: Seq[(String, String)], headers: Seq[(String, String)]): String = {
    val h = headers.map { case (k, v) => (k.toLowerCase(Locale.ROOT), v.trim) }
    def slot(name: String): String =
      h.find(_._1 == name).map(_._2).getOrElse("")
    // 2015-02-21+: a zero Content-Length signs as the empty string
    val contentLength = slot("content-length") match {
      case "" | "0" => ""
      case v => v
    }
    // Date slot is empty when x-ms-date is carried (the recommended form)
    val dateSlot = if (slot("x-ms-date").nonEmpty) "" else slot("date")
    val canonicalHeaders = h.filter(_._1.startsWith("x-ms-"))
      .sortBy(_._1).map { case (k, v) => s"$k:$v\n" }.mkString
    val canonicalResource = s"/$account$path" +
      query.map { case (k, v) => (k.toLowerCase(Locale.ROOT), v) }
        .sortBy(_._1).map { case (k, v) => s"\n$k:$v" }.mkString
    Seq(method, slot("content-encoding"), slot("content-language"),
      contentLength, slot("content-md5"), slot("content-type"), dateSlot,
      slot("if-modified-since"), slot("if-match"), slot("if-none-match"),
      slot("if-unmodified-since"), slot("range")).mkString("\n") +
      "\n" + canonicalHeaders + canonicalResource
  }

  def signature(toSign: String, accountKeyB64: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(Base64.getDecoder.decode(accountKeyB64),
      "HmacSHA256"))
    Base64.getEncoder.encodeToString(mac.doFinal(toSign.getBytes(UTF_8)))
  }

  def authorizationHeader(account: String, sig: String): String =
    s"SharedKey $account:$sig"
}

/** Blob REST client for one container (keys are blob names under it). */
private[io] final class AzureBlobClient(endpoint: String, account: String,
    accountKeyB64: String, container: String)
    extends ObjectClient with Serializable {

  private def blobPath(key: String): String = s"/$container/$key"

  private def request(method: String, path: String,
      query: Seq[(String, String)], body: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): HttpURLConnection = {
    val qs =
      if (query.isEmpty) ""
      else "?" + query.map { case (k, v) =>
        s"${SigV4.uriEncode(k, keepSlash = false)}=${SigV4.uriEncode(v, keepSlash = false)}"
      }.mkString("&")
    val url = new URL(endpoint + SigV4.uriEncode(path, keepSlash = true) + qs)
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    val hasBody = body != null && (body.nonEmpty || method == "PUT")
    val baseHeaders = Seq(
      "x-ms-date" -> AzureSharedKey.msDate(Instant.now()),
      "x-ms-version" -> "2020-10-02") ++
      (if (hasBody)
        Seq("content-length" -> body.length.toString,
          "content-type" -> "application/octet-stream")
      else Nil) ++ extraHeaders
    val sig =
      if (accountKeyB64.isEmpty) ""
      else AzureSharedKey.signature(
        AzureSharedKey.stringToSign(method, account, path, query, baseHeaders),
        accountKeyB64)
    baseHeaders.foreach { case (k, v) =>
      if (k != "content-length") conn.setRequestProperty(k, v)
    }
    // empty key = anonymous access (public containers): send NO
    // Authorization header rather than an empty-key signature
    if (accountKeyB64.nonEmpty)
      conn.setRequestProperty("Authorization",
        AzureSharedKey.authorizationHeader(account, sig))
    if (hasBody) {
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      val out = conn.getOutputStream
      out.write(body)
      out.close()
    }
    conn
  }

  private def drainAndClose(conn: HttpURLConnection): Unit =
    ObjectHttp.drainAndClose(conn)

  override def head(key: String): Option[Long] = {
    val c = request("HEAD", blobPath(key), Nil, null)
    val rc = c.getResponseCode
    val len = c.getHeaderField("Content-Length")
    drainAndClose(c)
    if (rc == 200) Some(Option(len).map(_.toLong).getOrElse(0L)) else None
  }

  override def getRange(key: String, from: Long): InputStream = {
    val c = request("GET", blobPath(key), Nil, null,
      if (from > 0) Seq("x-ms-range" -> s"bytes=$from-") else Nil)
    val rc = c.getResponseCode
    if (rc != 200 && rc != 206) {
      drainAndClose(c)
      throw new java.io.IOException(s"Azure GET $key from=$from -> $rc")
    }
    c.getInputStream
  }

  override def put(key: String, data: Array[Byte]): Unit = {
    val c = request("PUT", blobPath(key), Nil, data,
      Seq("x-ms-blob-type" -> "BlockBlob"))
    val rc = c.getResponseCode
    drainAndClose(c)
    if (rc != 201) throw new java.io.IOException(s"Azure PUT $key -> $rc")
  }

  override def copy(srcKey: String, dstKey: String): Unit = {
    val srcUrl = endpoint +
      SigV4.uriEncode(blobPath(srcKey), keepSlash = true)
    val c = request("PUT", blobPath(dstKey), Nil, Array.empty,
      Seq("x-ms-blob-type" -> "BlockBlob", "x-ms-copy-source" -> srcUrl))
    val rc = c.getResponseCode
    drainAndClose(c)
    if (rc != 201 && rc != 202)
      throw new java.io.IOException(s"Azure COPY $srcKey -> $rc")
  }

  override def delete(key: String): Unit = {
    val c = request("DELETE", blobPath(key), Nil, null)
    val rc = c.getResponseCode
    drainAndClose(c)
    if (rc != 202 && rc != 404)
      throw new java.io.IOException(s"Azure DELETE $key -> $rc")
  }

  override def list(prefix: String,
      delimiter: String): (Seq[(String, Long)], Seq[String]) = {
    val nameRe =
      "(?s)<Blob><Name>(.*?)</Name>.*?<Content-Length>(\\d+)</Content-Length>".r
    val bpRe = "<BlobPrefix><Name>(.*?)</Name></BlobPrefix>".r
    val blobs = Seq.newBuilder[(String, Long)]
    val cps = Seq.newBuilder[String]
    var marker: Option[String] = None
    var more = true
    while (more) {
      val q = Seq("restype" -> "container", "comp" -> "list",
        "prefix" -> prefix) ++
        (if (delimiter.nonEmpty) Seq("delimiter" -> delimiter) else Nil) ++
        marker.map("marker" -> _)
      val c = request("GET", s"/$container", q, null)
      val rc = c.getResponseCode
      if (rc != 200) {
        drainAndClose(c)
        throw new java.io.IOException(s"Azure LIST $container/$prefix -> $rc")
      }
      val xml = new String(c.getInputStream.readAllBytes(), UTF_8)
      c.getInputStream.close()
      blobs ++= nameRe.findAllMatchIn(xml)
        .map(m => (xmlUnescape(m.group(1)), m.group(2).toLong))
      cps ++= bpRe.findAllMatchIn(xml).map(m => xmlUnescape(m.group(1)))
      marker = "<NextMarker>(.+?)</NextMarker>".r
        .findFirstMatchIn(xml).map(m => xmlUnescape(m.group(1)))
      more = marker.isDefined
    }
    (blobs.result(), cps.result().distinct)
  }

  // ---- Block Blob staged writes (r17) — Azure's multipart: Put Block +
  // Put Block List (the published Blob REST operations). The service mints
  // no upload id and uncommitted blocks expire server-side after a week, so
  // createMultipart mints a client-local id (block IDs must be SAME-LENGTH
  // base64 within a blob — fixed-width part numbers guarantee it) and
  // abort is a no-op.
  private val uploadSeq = new java.util.concurrent.atomic.AtomicLong(0)

  override def createMultipart(key: String): Option[String] =
    Some(f"g${uploadSeq.incrementAndGet()}%08d")

  private def blockId(uploadId: String, n: Int): String =
    java.util.Base64.getEncoder.encodeToString(
      f"$uploadId%s-$n%08d".getBytes(UTF_8))

  override def uploadPart(key: String, uploadId: String, partNumber: Int,
      data: Array[Byte]): String = {
    val bid = blockId(uploadId, partNumber)
    val c = request("PUT", blobPath(key),
      Seq("blockid" -> bid, "comp" -> "block"), data)
    val rc = c.getResponseCode
    drainAndClose(c)
    if (rc != 201)
      throw new java.io.IOException(s"Azure PutBlock $key#$partNumber -> $rc")
    bid
  }

  override def completeMultipart(key: String, uploadId: String,
      parts: Seq[(Int, String)]): Unit = {
    val xml = parts.sortBy(_._1).map(p => s"<Latest>${p._2}</Latest>")
      .mkString("<?xml version=\"1.0\" encoding=\"utf-8\"?><BlockList>",
        "", "</BlockList>")
    val c = request("PUT", blobPath(key), Seq("comp" -> "blocklist"),
      xml.getBytes(UTF_8))
    val rc = c.getResponseCode
    drainAndClose(c)
    if (rc != 201)
      throw new java.io.IOException(s"Azure PutBlockList $key -> $rc")
  }

  private def xmlUnescape(s: String): String = ObjectHttp.xmlUnescape(s)
}

/** Hadoop FileSystem over the Blob REST protocol. URI form:
  * `wasb://container@account/path` (the standard WASB shape); endpoint and
  * account key come from `fs.azlite.endpoint` / `fs.azlite.account.<a>.key`
  * (per-account settings win).
  */
final class AzureLiteFileSystem extends ObjectFileSystem {
  override def getScheme: String = "wasb"
  /** Streaming-write block size (fs.azlite.multipart.size, default 64 MB):
    * a blob beyond one block streams as staged Put Block calls + one Put
    * Block List, keeping writer memory at one block.
    */
  override protected def multipartPartSize(conf: Configuration): Long =
    conf.getLong("fs.azlite.multipart.size", 64L * 1024 * 1024)
  override protected def makeClient(conf: Configuration,
      authority: String): ObjectClient = {
    val parts = authority.split("@", 2)
    require(parts.length == 2,
      s"wasb authority must be container@account (got '$authority')")
    val (container, account) = (parts(0), parts(1).split("\\.")(0))
    def perAccount(suffix: String): String =
      conf.get(s"fs.azlite.account.$account.$suffix",
        conf.get(s"fs.azlite.$suffix", ""))
    val endpoint = perAccount("endpoint")
    require(endpoint.nonEmpty, "fs.azlite.endpoint must be set")
    new AzureBlobClient(endpoint, account, perAccount("key"), container)
  }
}

/** Loopback Azure Blob endpoint: in-memory blobs, SharedKey VERIFIED on
  * every request (the server rebuilds the string-to-sign from the raw
  * request and compares; a bad or missing signature is a 403). Supports
  * Get/Put/Delete Blob, Copy Blob (x-ms-copy-source), List Blobs with
  * prefix/delimiter and NextMarker pagination, and Put Block / Put Block
  * List staged writes (r17).
  */
final class AzureLiteServer(account: String, accountKeyB64: String,
    maxResultsPerPage: Int = 1000) {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

  private val blobs = new ConcurrentHashMap[String, Array[Byte]]()
  // uncommitted staged blocks: (blob path, block id) -> data (r17)
  private val staged = new ConcurrentHashMap[(String, String), Array[Byte]]()
  private val committedBlocks = new ConcurrentHashMap[String, Integer]()
  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"

  def putBlob(containerAndName: String, data: Array[Byte]): Unit =
    blobs.put(containerAndName, data)
  def blobNames: Seq[String] = blobs.keySet().asScala.toSeq.sorted
  /** Block count of a blob committed via Put Block List (spec surface). */
  def blockCount(containerAndName: String): Option[Int] =
    Option(committedBlocks.get(containerAndName)).map(_.intValue)
  def stagedBlockCount: Int = staged.size

  def start(): AzureLiteServer = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try handleOne(ex)
        catch { case e: Exception => respond(ex, 500, e.toString.getBytes(UTF_8)) }
        finally ex.close()
    })
    server.start()
    this
  }
  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
      headers: Seq[(String, String)] = Nil): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    if (ex.getRequestMethod == "HEAD") {
      ex.getResponseHeaders.set("Content-Length", body.length.toString)
      ex.sendResponseHeaders(code, -1)
    } else {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1L else body.length.toLong)
      if (body.nonEmpty) { ex.getResponseBody.write(body); ex.getResponseBody.close() }
    }
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def pathDecode(raw: String): String =
    java.net.URLDecoder.decode(raw.replace("+", "%2B"), "UTF-8")

  private def queryParams(ex: HttpExchange): Seq[(String, String)] =
    Option(ex.getRequestURI.getRawQuery).toSeq.flatMap(_.split("&")).map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) (java.net.URLDecoder.decode(kv, "UTF-8"), "")
      else (java.net.URLDecoder.decode(kv.substring(0, i), "UTF-8"),
        java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8"))
    }

  private def verify(ex: HttpExchange): Boolean = {
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    if (auth == null || !auth.startsWith(s"SharedKey $account:")) return false
    val claimed = auth.stripPrefix(s"SharedKey $account:")
    val headers = ex.getRequestHeaders.asScala.toSeq.flatMap { case (k, vs) =>
      vs.asScala.map(v => k -> v)
    }
    val toSign = AzureSharedKey.stringToSign(ex.getRequestMethod, account,
      pathDecode(ex.getRequestURI.getRawPath), queryParams(ex), headers)
    val expected = AzureSharedKey.signature(toSign, accountKeyB64)
    MessageDigest.isEqual(expected.getBytes(UTF_8), claimed.getBytes(UTF_8))
  }

  private def handleOne(ex: HttpExchange): Unit = {
    val body = ex.getRequestBody.readAllBytes()
    if (!verify(ex)) {
      respond(ex, 403, "AuthenticationFailed".getBytes(UTF_8)); return
    }
    val path = pathDecode(ex.getRequestURI.getRawPath).stripPrefix("/")
    val params = queryParams(ex).toMap
    val isList = params.get("comp").contains("list")
    ex.getRequestMethod match {
      case "GET" if isList =>
        val container = path.split("/", 2)(0)
        val prefix = params.getOrElse("prefix", "")
        val delim = params.getOrElse("delimiter", "")
        val all0 = blobs.keySet().asScala.toSeq.sorted
          .filter(k => k.startsWith(s"$container/") &&
            k.stripPrefix(s"$container/").startsWith(prefix))
          .map(_.stripPrefix(s"$container/"))
        val afterMarker = params.get("marker") match {
          case Some(mk) => all0.dropWhile(_ <= mk)
          case None => all0
        }
        val page = afterMarker.take(maxResultsPerPage)
        val truncated = afterMarker.length > page.length
        val (direct, prefixed) =
          if (delim.isEmpty) (page, Seq.empty[String])
          else page.partition(k => !k.stripPrefix(prefix).contains(delim))
        val cps = prefixed
          .map(k => prefix + k.stripPrefix(prefix).takeWhile(_ != delim.head) + delim)
          .distinct
        val xml = new StringBuilder(
          "<?xml version=\"1.0\" encoding=\"utf-8\"?><EnumerationResults><Blobs>")
        direct.foreach { k =>
          val size = blobs.get(s"$container/$k").length
          xml.append(s"<Blob><Name>${xmlEscape(k)}</Name><Properties>" +
            s"<Content-Length>$size</Content-Length></Properties></Blob>")
        }
        cps.foreach(cp =>
          xml.append(s"<BlobPrefix><Name>${xmlEscape(cp)}</Name></BlobPrefix>"))
        xml.append("</Blobs>")
        if (truncated)
          xml.append(s"<NextMarker>${xmlEscape(page.last)}</NextMarker>")
        xml.append("</EnumerationResults>")
        respond(ex, 200, xml.toString.getBytes(UTF_8),
          Seq("Content-Type" -> "application/xml"))
      case "GET" =>
        Option(blobs.get(path)) match {
          case None => respond(ex, 404, "BlobNotFound".getBytes(UTF_8))
          case Some(data) =>
            val range = Option(ex.getRequestHeaders.getFirst("x-ms-range"))
              .orElse(Option(ex.getRequestHeaders.getFirst("Range")))
            range match {
              case Some(r) if r.startsWith("bytes=") =>
                val spec = r.stripPrefix("bytes=")
                val from = spec.takeWhile(_ != '-').toLong
                val toOpt = spec.dropWhile(_ != '-').drop(1)
                val to = if (toOpt.isEmpty) data.length - 1L
                  else math.min(toOpt.toLong, data.length - 1L)
                if (from >= data.length) respond(ex, 416, Array.empty)
                else respond(ex, 206,
                  java.util.Arrays.copyOfRange(data, from.toInt, to.toInt + 1))
              case _ => respond(ex, 200, data)
            }
        }
      case "HEAD" =>
        Option(blobs.get(path)) match {
          case None => respond(ex, 404, Array.empty)
          case Some(data) => respond(ex, 200, data)
        }
      case "PUT" if params.get("comp").contains("block") =>
        // Put Block: stage the data uncommitted under its block id
        val bid = params.getOrElse("blockid", "")
        if (bid.isEmpty) respond(ex, 400, "MissingBlockId".getBytes(UTF_8))
        else { staged.put((path, bid), body); respond(ex, 201, Array.empty) }
      case "PUT" if params.get("comp").contains("blocklist") =>
        // Put Block List: commit in the XML's order; any id not staged (or
        // already consumed) is the client's error
        val ids = "<(?:Latest|Uncommitted|Committed)>(.*?)</".r
          .findAllMatchIn(new String(body, UTF_8)).map(_.group(1)).toSeq
        val missing = ids.filter(id => !staged.containsKey((path, id)))
        if (missing.nonEmpty)
          respond(ex, 400, s"InvalidBlockList: ${missing.head}".getBytes(UTF_8))
        else {
          val out = new java.io.ByteArrayOutputStream()
          ids.foreach(id => out.write(staged.get((path, id))))
          ids.foreach(id => staged.remove((path, id)))
          blobs.put(path, out.toByteArray)
          committedBlocks.put(path, ids.length)
          respond(ex, 201, Array.empty)
        }
      case "PUT" =>
        val copySrc = ex.getRequestHeaders.getFirst("x-ms-copy-source")
        if (copySrc != null) {
          val srcPath = pathDecode(new java.net.URI(copySrc).getRawPath)
            .stripPrefix("/")
          Option(blobs.get(srcPath)) match {
            case None => respond(ex, 404, "BlobNotFound".getBytes(UTF_8))
            case Some(data) =>
              blobs.put(path, data)
              respond(ex, 202, Array.empty,
                Seq("x-ms-copy-status" -> "success"))
          }
        } else {
          blobs.put(path, body)
          respond(ex, 201, Array.empty)
        }
      case "DELETE" =>
        if (blobs.remove(path) != null) respond(ex, 202, Array.empty)
        else respond(ex, 404, Array.empty)
      case other =>
        respond(ex, 405, s"method $other".getBytes(UTF_8))
    }
  }
}
