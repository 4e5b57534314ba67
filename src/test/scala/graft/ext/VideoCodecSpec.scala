package graft.ext

import graft.SparkTestBase
import graft.ext.Multimodal.{ImageCodec, VideoCodec}

/** The REAL video path: a frame-indexed MJPEG-style container ("GVF1"
  * magic + length-prefixed independently-encoded frames) parsed over
  * the JDK-native image decode. Frame CONTENT is proven by replaying
  * the generator's pixel arithmetic against the decoded rasters — the
  * same discipline as `ImageCodecSpec`, lifted to containers.
  */
class VideoCodecSpec extends SparkTestBase {

  test("container round-trips: frame count, dims, and exact pixels") {
    val video = VideoCodec.encodeVideo(nFrames = 4, width = 9, height = 7, seed = 42L)
    assert(video(0) == 'G'.toByte && video(3) == '1'.toByte)
    val frames = VideoCodec.decodeFrames(video).get
    assert(frames.map(_._1) == Seq(0, 1, 2, 3))
    for ((f, meta, img) <- frames) {
      assert(meta == Multimodal.ImageMeta("png", 9, 7, 3))
      val seed = 42L + 131L * f
      for (y <- 0 until 7; x <- 0 until 9) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == ((x * 31 + y * 17 + seed) & 0xff), s"r f=$f ($x,$y)")
        assert(((rgb >> 8) & 0xff) == ((x * 7 + y * 13 + (seed >> 8)) & 0xff), s"g f=$f")
        assert((rgb & 0xff) == ((x * 3 + y * 29 + (seed >> 16)) & 0xff), s"b f=$f")
      }
    }
  }

  test("zero-frame container decodes to an empty frame list") {
    assert(VideoCodec.decodeFrames(VideoCodec.encode(Seq.empty)).get.isEmpty)
  }

  test("quarantines bad magic, truncation, and corrupt frames") {
    val video = VideoCodec.encodeVideo(3, 8, 6, 7L)
    assert(VideoCodec.decodeFrames(null).isEmpty, "null")
    assert(VideoCodec.decodeFrames(Array[Byte](1, 2, 3)).isEmpty, "short")
    val badMagic = video.clone(); badMagic(0) = 'X'.toByte
    assert(VideoCodec.decodeFrames(badMagic).isEmpty, "magic")
    assert(VideoCodec.decodeFrames(video.take(6)).isEmpty, "index truncated")
    assert(VideoCodec.decodeFrames(video.take(video.length - 3)).isEmpty,
      "last frame truncated")
    val corrupt = video.clone()
    java.util.Arrays.fill(corrupt, 40, video.length, 0.toByte)
    assert(VideoCodec.decodeFrames(corrupt).isEmpty, "corrupt frame body")
    // A plain PNG is an image, not a container.
    assert(VideoCodec.decodeFrames(ImageCodec.encodePng(8, 8, 1L)).isEmpty)
  }

  test("videoFrameStats / quarantineVideos split a mixed binary column") {
    import spark.implicits._
    val rows = Seq(
      (1L, VideoCodec.encodeVideo(2, 6, 6, 1L)),
      (2L, "not a video".getBytes),
      (3L, VideoCodec.encodeVideo(1, 7, 5, 3L)),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "payload")
    val stats = Multimodal.videoFrameStats(rows, "doc_id", "payload")
      .collect().sortBy(s => (s.doc_id, s.frame_no))
    assert(stats.map(s => (s.doc_id, s.frame_no)).toSeq ==
      Seq((1L, 0), (1L, 1), (3L, 0)))
    // Pixel-sum replay for doc 3 frame 0 (seed 3, 7x5).
    val s3 = stats.last
    val expR = (for (y <- 0 until 5; x <- 0 until 7) yield (x * 31 + y * 17 + 3L) & 0xff).sum
    assert(s3.width == 7 && s3.height == 5 && s3.sum_r == expR)
    val quarantined = Multimodal.quarantineVideos(rows, "doc_id", "payload")
      .collect().map(_.doc_id).sorted
    assert(quarantined.toSeq == Seq(2L, 4L))
    // Map-only contract: payload bytes never shuffle — decode runs
    // where the scan read them (the property that matters at 100 TB).
    val plan = Multimodal.videoFrameStats(rows, "doc_id", "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
