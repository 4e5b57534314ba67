package graft.ingest

import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Path, Paths}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.EmailConfig

/** Email-attachment source (SURVEY S10-S11; reference
  * email_processor/handler.py:103-237).
  *
  * Semantics preserved: decode RFC2047 headers (handler.py:124-139),
  * walk MIME parts and keep those with Content-Disposition: attachment
  * (handler.py:153-176), filter by allowed extension (handler.py:165-169,
  * case-insensitive), route config by sender with a `default` fallback
  * (handler.py:26-58), land each attachment for the per-format reader.
  *
  * The MIME parser is a dependency-free implementation of the subset the
  * reference exercises (multipart boundaries, base64/quoted-printable/7bit
  * transfer encodings) — jakarta.mail is not available offline.
  */
object EmailSource {

  final case class Attachment(filename: String, contentType: String, payload: Array[Byte])
  final case class ParsedEmail(from: String, subject: String, attachments: Seq[Attachment])

  // ---- sender-based config routing (S11; handler.py:26-58) ----

  /** Match the From header against per-sender configs; fall back to
    * `default`. Matching is on the bare address, case-insensitive.
    */
  def routeConfig[A](from: String, configs: Map[String, A]): Option[A] = {
    val addr = bareAddress(from).toLowerCase
    configs.collectFirst { case (k, v) if k.toLowerCase == addr => v }
      .orElse(configs.get("default"))
  }

  private[ingest] def bareAddress(from: String): String = {
    val i = from.indexOf('<')
    if (i >= 0 && from.indexOf('>') > i) from.substring(i + 1, from.indexOf('>')).trim
    else from.trim
  }

  // ---- MIME parsing ----

  def parse(raw: String): ParsedEmail = {
    val (headers, body) = splitHeaders(raw)
    val from = decodeHeader(headers.getOrElse("from", ""))
    val subject = decodeHeader(headers.getOrElse("subject", ""))
    val contentType = headers.getOrElse("content-type", "text/plain")
    val attachments =
      boundaryOf(contentType) match {
        case Some(b) => parts(body, b).flatMap(attachmentOf)
        case None    => Nil
      }
    ParsedEmail(from, subject, attachments)
  }

  /** Keep attachments whose extension is allowed (case-insensitive),
    * mirroring handler.py:165-169.
    */
  def allowedAttachments(email: ParsedEmail, cfg: EmailConfig): Seq[Attachment] =
    email.attachments.filter { a =>
      val ext = a.filename.lastIndexOf('.') match {
        case -1 => ""
        case i  => a.filename.substring(i).toLowerCase
      }
      cfg.allowedExtensions.map(_.toLowerCase).contains(ext)
    }

  /** Land allowed attachments under `dir` and return the landed paths —
    * the per-format reader (SourceReader / binaryFile) takes over from
    * there, matching the reference's S3 landing step (handler.py:178-237).
    */
  def land(email: ParsedEmail, cfg: EmailConfig, dir: String): Seq[Path] = {
    Files.createDirectories(Paths.get(dir))
    allowedAttachments(email, cfg).map { a =>
      val p = Paths.get(dir, sanitizeFilename(a.filename))
      Files.write(p, a.payload)
      p
    }
  }

  /** Landing names are portable-charset only: header-supplied filenames
    * must not traverse directories (`../`) or break on filesystems
    * without a unicode locale. When sanitization changes the name, a
    * short hash of the ORIGINAL name is appended so distinct
    * attachments can never collide onto one landing file (e.g.
    * 'dáily.csv' and 'dàily.csv' both map to 'd_ily' but get different
    * suffixes). The parsed Attachment keeps the decoded original for
    * metadata.
    */
  private[ingest] def sanitizeFilename(name: String): String = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    val safe = base.map(c => if (c.isLetterOrDigit && c < 128 || "._-".contains(c)) c else '_')
    val usable = if (safe.isEmpty || safe.forall(_ == '.')) "attachment.bin" else safe
    // Tag whenever ANY part of the original (including a stripped
    // directory prefix) was altered, hashing the FULL original name —
    // 'a/report.csv' and 'b/report.csv' must land distinctly.
    if (usable == name) usable
    else {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(name.getBytes(StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString
      val dot = usable.lastIndexOf('.')
      if (dot > 0) s"${usable.substring(0, dot)}-$tag${usable.substring(dot)}"
      else s"$usable-$tag"
    }
  }

  /** Landed binary payloads as a DataFrame (binaryFile source): path,
    * length, content — the multimodal-column entry path.
    */
  def readLanded(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  // ---- internals ----

  private def splitHeaders(s: String): (Map[String, String], String) = {
    val norm = s.replace("\r\n", "\n")
    val idx = norm.indexOf("\n\n")
    val (head, body) = if (idx < 0) (norm, "") else (norm.take(idx), norm.drop(idx + 2))
    // unfold continuation lines (leading whitespace)
    val unfolded = head.split('\n').foldLeft(List.empty[String]) {
      case (acc, line) if line.nonEmpty && (line.head == ' ' || line.head == '\t') && acc.nonEmpty =>
        (acc.head + " " + line.trim) :: acc.tail
      case (acc, line) => line :: acc
    }.reverse
    val headers = unfolded.flatMap { l =>
      val i = l.indexOf(':')
      if (i > 0) Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim) else None
    }.toMap
    (headers, body)
  }

  private def boundaryOf(contentType: String): Option[String] = {
    val m = """boundary="?([^";]+)"?""".r.findFirstMatchIn(contentType)
    m.map(_.group(1))
  }

  private def parts(body: String, boundary: String): Seq[String] = {
    val delim = s"--$boundary"
    body.split(java.util.regex.Pattern.quote(delim))
      .drop(1)                       // preamble
      .takeWhile(!_.startsWith("--")) // closing delimiter "--boundary--"
      .map(_.stripPrefix("\n").stripSuffix("\n"))
      .toSeq
  }

  private def attachmentOf(part: String): Option[Attachment] = {
    val (headers, body) = splitHeaders(part)
    val disp = headers.getOrElse("content-disposition", "")
    if (!disp.toLowerCase.startsWith("attachment")) return None
    val filename = """filename="?([^";]+)"?""".r.findFirstMatchIn(disp)
      .map(m => decodeHeader(m.group(1)))
      .getOrElse("attachment.bin")
    val encoding = headers.getOrElse("content-transfer-encoding", "7bit").toLowerCase
    val payload = encoding match {
      case "base64" => Base64.getMimeDecoder.decode(body.replaceAll("\\s", ""))
      case "quoted-printable" => decodeQuotedPrintable(body).getBytes(StandardCharsets.ISO_8859_1)
      case _ => body.getBytes(StandardCharsets.UTF_8)
    }
    Some(Attachment(filename, headers.getOrElse("content-type", "application/octet-stream"), payload))
  }

  /** RFC2047 encoded-word decoding (=?charset?B|Q?...?=), the
    * decode_header equivalent (handler.py:124-133).
    */
  private[ingest] def decodeHeader(h: String): String = {
    val Word = """=\?([^?]+)\?([BbQq])\?([^?]*)\?=""".r
    Word.replaceAllIn(h, m => {
      val cs = Charset.forName(m.group(1))
      val decoded = m.group(2).toUpperCase match {
        case "B" => new String(Base64.getMimeDecoder.decode(m.group(3)), cs)
        // Q-decoding yields raw bytes as 0-255 chars; re-decode them with
        // the word's declared charset (=?utf-8?Q?=C3=A9?= → "é", not "Ã©").
        case "Q" => new String(
          decodeQuotedPrintable(m.group(3).replace('_', ' '))
            .getBytes(StandardCharsets.ISO_8859_1), cs)
      }
      scala.util.matching.Regex.quoteReplacement(decoded)
    })
  }

  private[ingest] def decodeQuotedPrintable(s: String): String = {
    val clean = s.replace("=\r\n", "").replace("=\n", "") // soft line breaks
    val sb = new StringBuilder
    var i = 0
    while (i < clean.length) {
      val c = clean.charAt(i)
      if (c == '=' && i + 2 < clean.length) {
        try {
          sb.append(Integer.parseInt(clean.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
