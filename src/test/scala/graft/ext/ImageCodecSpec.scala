package graft.ext

import graft.SparkTestBase
import graft.ext.Multimodal.ImageCodec

/** The REAL image path: javax.imageio decode/resize over actual encoded
  * bitstreams (PNG/JPEG/BMP/GIF ship with the JDK — no external media
  * libs). Complements the stub codec specs: here the asserted
  * dimensions come from decoding real container bytes, and corrupt
  * payloads must take the quarantine lane, not throw.
  */
class ImageCodecSpec extends SparkTestBase {

  test("decodes its own PNG with exact dimensions, format, and bands") {
    val png = ImageCodec.encodePng(37, 21, seed = 42L)
    // PNG magic, to prove these are real container bytes.
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val meta = ImageCodec.decode(png).get
    assert(meta == Multimodal.ImageMeta("png", 37, 21, 3))
  }

  test("decodes JDK-encoded JPEG, BMP, and GIF containers") {
    val img = new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (fmt <- Seq("jpg" -> "jpeg", "bmp" -> "bmp", "gif" -> "gif")) {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt._1, baos), s"writer for ${fmt._1}")
      val meta = ImageCodec.decode(baos.toByteArray).get
      assert(meta.format == fmt._2, fmt._1)
      assert(meta.width == 16 && meta.height == 12, fmt._1)
    }
  }

  test("quarantines corrupt, truncated, non-image, and null payloads") {
    val png = ImageCodec.encodePng(20, 20, 7L)
    assert(ImageCodec.decode(png.take(12)).isEmpty, "truncated header")
    val corrupt = png.clone(); java.util.Arrays.fill(corrupt, 30, png.length, 0.toByte)
    assert(ImageCodec.decode(corrupt).isEmpty, "corrupt body")
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("resizePng produces a decodable PNG at the target dimensions") {
    val png = ImageCodec.encodePng(40, 30, 5L)
    val out = ImageCodec.resizePng(png, 20, 15).get
    assert(ImageCodec.decode(out).get == Multimodal.ImageMeta("png", 20, 15, 3))
    assert(ImageCodec.resizePng("junk".getBytes ++ new Array[Byte](64), 4, 4).isEmpty)
  }

  test("decodeImages / quarantineImages split a mixed binary column") {
    import spark.implicits._
    val rows = Seq(
      (1L, ImageCodec.encodePng(10, 9, 1L)),
      (2L, "definitely not an image".getBytes),
      (3L, ImageCodec.encodePng(8, 8, 3L)),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "payload")
    val decoded = Multimodal.decodeImages(rows, "doc_id", "payload")
      .collect().sortBy(_.doc_id)
    assert(decoded.map(_.doc_id).toSeq == Seq(1L, 3L))
    assert(decoded.head == Multimodal.ImageFeatures(1L, "png", 10, 9, 3))
    val bad = Multimodal.quarantineImages(rows, "doc_id", "payload")
      .collect().map(_.doc_id).sorted
    assert(bad.toSeq == Seq(2L, 4L))
  }

  test("decode is map-only — payload bytes never shuffle") {
    import spark.implicits._
    val rows = Seq((1L, ImageCodec.encodePng(8, 8, 1L))).toDF("doc_id", "payload")
    val plan = Multimodal.decodeImages(rows, "doc_id", "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle payloads:\n$plan")
  }

  test("resizeImages halves dimensions with floor-1 and re-decodes") {
    import spark.implicits._
    val rows = Seq(
      (1L, ImageCodec.encodePng(9, 4, 1L)),  // 9/2=4, 4/2=2
      (2L, ImageCodec.encodePng(1, 1, 2L)),  // floors to 1x1, not 0
      (3L, "garbage".getBytes)
    ).toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(rows, "doc_id", "payload", 2)
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == Seq(
      Multimodal.ImageFeatures(1L, "png", 4, 2, 3),
      Multimodal.ImageFeatures(2L, "png", 1, 1, 3)))
  }
}
