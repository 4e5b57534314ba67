package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import graft.SparkTestBase
import graft.config.EmailConfig

/** MIME parsing + sender routing suite (SURVEY §5.1; reference
  * email_processor/handler.py): multipart walk, base64 /
  * quoted-printable / 7bit transfer encodings, RFC2047 header words,
  * extension filtering, landing + binaryFile readback.
  */
class EmailSourceSpec extends SparkTestBase {

  private val csvPayload = "id,name\n1,alpha\n2,beta\n"
  private val csvB64 = Base64.getMimeEncoder.encodeToString(csvPayload.getBytes(StandardCharsets.UTF_8))

  /** Multipart fixture: RFC2047 B- and Q-encoded headers, a text body,
    * a base64 CSV attachment (encoded filename), a quoted-printable
    * attachment, and a disallowed .exe.
    */
  private val raw =
    s"""From: =?utf-8?B?RMOhdGE=?= Team <reports@partner.example>
       |Subject: =?utf-8?Q?Daily_r=C3=A9port?=
       |MIME-Version: 1.0
       |Content-Type: multipart/mixed; boundary="XYZ"
       |
       |preamble to ignore
       |--XYZ
       |Content-Type: text/plain
       |
       |Body text, not an attachment.
       |--XYZ
       |Content-Type: text/csv
       |Content-Disposition: attachment; filename="=?utf-8?Q?d=C3=A1ily.csv?="
       |Content-Transfer-Encoding: base64
       |
       |$csvB64
       |--XYZ
       |Content-Type: text/plain
       |Content-Disposition: attachment; filename="notes.txt"
       |Content-Transfer-Encoding: quoted-printable
       |
       |caf=C3=A9 line one=
       | continues
       |--XYZ
       |Content-Type: application/octet-stream
       |Content-Disposition: attachment; filename="virus.exe"
       |Content-Transfer-Encoding: base64
       |
       |AAAA
       |--XYZ--
       |epilogue
       |""".stripMargin

  test("parse decodes RFC2047 headers and walks multipart attachments") {
    val mail = EmailSource.parse(raw)
    assert(mail.from == "Dáta Team <reports@partner.example>")
    assert(mail.subject == "Daily réport")
    assert(mail.attachments.map(_.filename) == Seq("dáily.csv", "notes.txt", "virus.exe"))
    val csv = mail.attachments.head
    assert(new String(csv.payload, StandardCharsets.UTF_8) == csvPayload)
    assert(csv.contentType == "text/csv")
  }

  test("quoted-printable decodes hex escapes and soft line breaks") {
    val mail = EmailSource.parse(raw)
    val notes = new String(mail.attachments(1).payload, StandardCharsets.ISO_8859_1)
    assert(new String(notes.getBytes(StandardCharsets.ISO_8859_1), StandardCharsets.UTF_8)
      == "café line one continues")
    assert(EmailSource.decodeQuotedPrintable("a=3Db") == "a=b")
  }

  test("extension filter keeps allowed types only, case-insensitive") {
    val mail = EmailSource.parse(raw)
    val cfg = EmailConfig(allowedExtensions = Seq(".CSV", ".txt"))
    assert(EmailSource.allowedAttachments(mail, cfg).map(_.filename)
      == Seq("dáily.csv", "notes.txt"))
  }

  test("sender routing matches bare address and falls back to default") {
    val configs = Map("reports@partner.example" -> "partner", "default" -> "fallback")
    assert(EmailSource.routeConfig("Dáta Team <Reports@Partner.Example>", configs)
      .contains("partner"))
    assert(EmailSource.routeConfig("someone@else.example", configs).contains("fallback"))
    assert(EmailSource.routeConfig("x@y.example", Map("a@b.example" -> 1)).isEmpty)
  }

  test("land + binaryFile readback round-trips the payload") {
    val dir = Files.createTempDirectory("graft-email").toString
    val mail = EmailSource.parse(raw)
    val landed = EmailSource.land(mail, EmailConfig(allowedExtensions = Seq(".csv")), dir)
    // sanitized landing name: portable chars + collision-proof hash tag
    val name = landed.head.getFileName.toString
    assert(name.startsWith("d_ily-") && name.endsWith(".csv"))
    // distinct unicode names must land distinctly
    assert(EmailSource.sanitizeFilename("dáily.csv") != EmailSource.sanitizeFilename("dàily.csv"))
    val df = EmailSource.readLanded(spark, dir)
    val row = df.select("length", "content").collect().head
    assert(row.getLong(0) == csvPayload.getBytes(StandardCharsets.UTF_8).length)
    assert(new String(row.getAs[Array[Byte]](1), StandardCharsets.UTF_8) == csvPayload)
  }

  test("landed attachments flow end-to-end into multimodal decode") {
    // The full S10 chain on REAL landed binaries: MIME walk -> land ->
    // binaryFile read -> typed media features; every stage is the
    // production code path, no synthetic payload column.
    val dir = Files.createTempDirectory("graft-email-mm").toString
    val mail = EmailSource.parse(raw)
    val landed = EmailSource.land(
      mail, EmailConfig(allowedExtensions = Seq(".csv", ".txt")), dir)
    assert(landed.size == 2)
    val feats = graft.ext.Multimodal
      .decodeLanded(EmailSource.readLanded(spark, dir))
      .collect()
    assert(feats.length == 2) // both payloads exceed the 2-byte gate
    val bytes = csvPayload.getBytes(StandardCharsets.UTF_8)
    val expected = graft.ext.Multimodal.StubDecoder.decode(bytes)
    val csvFeat = feats.find(_.n_bytes == bytes.length).get
    assert((csvFeat.header_hash, csvFeat.width, csvFeat.height) == expected)
    // ids are stable across re-reads (path-derived, not positional)
    val again = graft.ext.Multimodal
      .decodeLanded(EmailSource.readLanded(spark, dir)).collect()
    assert(again.map(f => f.doc_id -> f.header_hash).toSet ==
      feats.map(f => f.doc_id -> f.header_hash).toSet)
  }
}
