package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{col, xxhash64}

/** Multimodal-column processing (north star): media payloads ride as
  * opaque binary columns with typed metadata; decode / feature-extract
  * runs as an imperative per-partition batch stage — the Scala analog
  * of a pandas-batch UDF (`mapInPandas`): typed input rows, an
  * executor-side iterator the decoder library consumes batch-wise, and
  * a declared output schema the optimizer can prune against.
  *
  * The decoder itself is a STUB: this container has no image/audio
  * codecs (SURVEY scope note), so [[StubDecoder]] deterministically
  * fakes a header parse from the payload bytes. A real deployment
  * swaps the decoder implementation; the Spark-side plumbing — binary
  * schema, partition iteration, batch shape, output encoder — is the
  * real, tested artifact.
  *
  * Scale: decode is map-only (no shuffle); payload bytes never leave
  * the partition where they were read. Partition sizing for ~MB-scale
  * payloads comes from spark.sql.files.maxPartitionBytes, not row
  * counts.
  */
object Multimodal {

  /** Typed decode result: byte length, a content hash of the header
    * window, and fake decoded dimensions.
    */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, header_hash: String, width: Int, height: Int)

  /** Deterministic stand-in for a media codec: "dimensions" derive from
    * the first payload bytes, the header hash from the first 16 bytes.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (String, Int, Int) = {
      val header = payload.take(16)
      val md = MessageDigest.getInstance("MD5")
      val hash = md.digest(header).map("%02x".format(_)).mkString
      val w = ((payload(0) & 0xff) % 640) + 1
      val h = ((payload(1) & 0xff) % 480) + 1
      (hash, w, h)
    }
  }

  /** Batch feature extraction over (doc_id, payload) rows. Rows with
    * payloads under 2 bytes are dropped (undecodable), mirroring how a
    * real decoder quarantines truncated media.
    */
  def decodeFeatures(docs: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    val rows: Dataset[(Long, Array[Byte])] = docs
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      // A codec-backed implementation would initialize the decoder once
      // here and feed it record batches; the stub decodes row-wise.
      // NULL or truncated payloads are quarantined (dropped), matching
      // the oracle's octet_length filter.
      it.filter(t => t._2 != null && t._2.length >= 2).map { case (id, payload) =>
        val (hash, w, h) = StubDecoder.decode(payload)
        MediaFeatures(id, payload.length.toLong, hash, w, h)
      }
    }(Encoders.product[MediaFeatures])
  }

  /** Entry path for LANDED binaries (the S10 → binaryFile → decode
    * chain): a `binaryFile`-sourced frame (path, content) becomes typed
    * media features, with doc_id = xxhash64 of the landing path —
    * stable across reruns and repartitionings, unlike a row number.
    */
  def decodeLanded(landed: DataFrame): Dataset[MediaFeatures] =
    decodeFeatures(
      landed.select(xxhash64(col("path")).as("doc_id"), col("content")),
      "doc_id", "content")

  /** DuckDB oracle replicating the stub decode from the text column the
    * fixture payloads derive from.
    *
    * ORACLE SCOPE: DuckDB 1.0 has no BLOB substring, so the oracle
    * indexes by character — equal to the engine's byte indexing only
    * for ASCII corpora (the fixture is ASCII). The engine's byte
    * semantics are the correct ones for real media payloads.
    */
  def decodeOracleSql(table: String, textCol: String, idCol: String): String =
    s"""SELECT $idCol AS doc_id,
       | CAST(octet_length(CAST($textCol AS BLOB)) AS BIGINT) AS n_bytes,
       | md5(substr($textCol, 1, 16)) AS header_hash,
       | CAST(ascii(substr($textCol, 1, 1)) % 640 + 1 AS INT) AS width,
       | CAST(ascii(substr($textCol, 2, 1)) % 480 + 1 AS INT) AS height
       |FROM $table WHERE octet_length(CAST($textCol AS BLOB)) >= 2""".stripMargin

  /** Typed resize result: the stub "resample" keeps the first
    * `targetBytes` of the payload (a real codec re-encodes; the content
    * hash proves which bytes flowed through the stage).
    */
  final case class ResizedMedia(doc_id: Long, out_bytes: Long, out_hash: String)

  /** Batch resize stage — same mapPartitions plumbing as decode. */
  def resize(docs: DataFrame, idCol: String, payloadCol: String, targetBytes: Int): Dataset[ResizedMedia] = {
    val rows = docs
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.filter(_._2 != null).map { case (id, payload) =>
        val out = payload.take(targetBytes)
        md.reset()
        ResizedMedia(id, out.length.toLong, md.digest(out).map("%02x".format(_)).mkString)
      }
    }(Encoders.product[ResizedMedia])
  }

  def resizeOracleSql(table: String, textCol: String, idCol: String, targetBytes: Int): String =
    s"""SELECT $idCol AS doc_id,
       | CAST(least(octet_length(CAST($textCol AS BLOB)), $targetBytes) AS BIGINT) AS out_bytes,
       | md5(substr($textCol, 1, $targetBytes)) AS out_hash
       |FROM $table WHERE $textCol IS NOT NULL""".stripMargin

  /** One row per sampled "frame": fixed-stride windows over the
    * payload, each hashed — the video frame-sampling shape (a real
    * pipeline decodes frames; the stride/window plumbing and the
    * per-frame fan-out are what Spark owns).
    */
  final case class Frame(doc_id: Long, frame_no: Int, frame_hash: String)

  def sampleFrames(
      docs: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, maxFrames: Int): Dataset[Frame] = {
    val rows = docs
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    rows.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.filter(_._2 != null).flatMap { case (id, payload) =>
        val nFrames = math.min(maxFrames, payload.length / frameBytes)
        (0 until nFrames).iterator.map { f =>
          val frame = payload.slice(f * frameBytes, (f + 1) * frameBytes)
          md.reset()
          Frame(id, f, md.digest(frame).map("%02x".format(_)).mkString)
        }
      }
    }(Encoders.product[Frame])
  }

  def framesOracleSql(
      table: String, textCol: String, idCol: String, frameBytes: Int, maxFrames: Int): String =
    s"""WITH f AS (
       |  SELECT $idCol AS doc_id, unnest(range(least($maxFrames,
       |    octet_length(CAST($textCol AS BLOB)) // $frameBytes))) AS frame_no, $textCol AS t
       |  FROM $table)
       |SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
       | md5(substr(t, frame_no * $frameBytes + 1, $frameBytes)) AS frame_hash
       |FROM f""".stripMargin

  // ------------------------------------------------------------------
  // REAL image codec — JDK-native javax.imageio (PNG/JPEG/BMP/GIF ship
  // with the JDK, no external media libs). The stub above remains the
  // video/audio path; images decode for real.
  // ------------------------------------------------------------------

  /** True decoded image metadata: container format as reported by the
    * ImageIO reader, pixel dimensions, and raster band count.
    */
  final case class ImageMeta(format: String, width: Int, height: Int, channels: Int)

  /** JDK-native image codec. All methods are executor-safe (no shared
    * mutable state; ImageIO's readers are instantiated per call).
    */
  object ImageCodec {
    // ImageIO's default read path spills to a disk-backed cache file per
    // image — pure overhead for in-memory byte arrays on 32 executor
    // threads. Memory-cache only.
    javax.imageio.ImageIO.setUseCache(false)

    /** Decodes any ImageIO-supported payload; None = quarantine (not an
      * image, truncated, or an unsupported container).
      */
    def decode(payload: Array[Byte]): Option[ImageMeta] =
      decodeImage(payload).map(_._1)

    /** Decode keeping the pixel raster — for stages that transform the
      * image after reading it (resize decodes the input ONCE through
      * this, not once for metadata and again for pixels).
      */
    def decodeImage(payload: Array[Byte]): Option[(ImageMeta, java.awt.image.BufferedImage)] = {
      if (payload == null || payload.length < 8) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val img = reader.read(0)
          Some((ImageMeta(
            reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
            img.getWidth, img.getHeight, img.getRaster.getNumBands), img))
        } finally reader.dispose()
      } catch { case _: Exception => None }
      finally iis.close()
    }

    /** Deterministic RGB test-pattern PNG — the fixture generator for
      * the roundtrip queries/specs (pixels derive from (x, y, seed)).
      */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val r = (x * 31 + y * 17 + seed) & 0xff
          val g = (x * 7 + y * 13 + (seed >> 8)) & 0xff
          val b = (x * 3 + y * 29 + (seed >> 16)) & 0xff
          img.setRGB(x, y, ((r << 16) | (g << 8) | b).toInt)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    /** Re-encode a PNG byte stream with a deterministic ancillary
      * `tEXt` chunk spliced in before IEND — pixel-identical, BYTE-
      * different output (the real-world "same picture, different
      * metadata/encoder" stream that exact byte-level dedup is blind
      * to and perceptual hashing must still catch). Pure integer
      * splice + CRC32, no float, no randomness.
      */
    def annotatePng(payload: Array[Byte], text: String): Array[Byte] = {
      val data = ("Comment\u0000" + text).getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val chunk = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(chunk)
      dos.writeInt(data.length)
      val typeAndData = "tEXt".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII) ++ data
      dos.write(typeAndData)
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      dos.writeInt(crc.getValue.toInt)
      dos.flush()
      // IEND chunk = 4-byte zero length + "IEND" + CRC = final 12 bytes.
      val cut = payload.length - 12
      payload.slice(0, cut) ++ chunk.toByteArray ++ payload.slice(cut, payload.length)
    }

    /** Real resample of an already-decoded raster: bilinear-scale to
      * (outW, outH), re-encode PNG.
      */
    def scalePng(src: java.awt.image.BufferedImage, outW: Int, outH: Int): Array[Byte] = {
      val out = new java.awt.image.BufferedImage(
        outW, outH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g2 = out.createGraphics()
      try {
        g2.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(src, 0, 0, outW, outH, null)
      } finally g2.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }

    /** Payload-to-payload resize convenience (one input decode). None =
      * input payload was undecodable (quarantine).
      */
    def resizePng(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
      decodeImage(payload).map { case (_, img) => scalePng(img, outW, outH) }
  }

  /** Decoded image features for (doc_id, payload) rows. */
  final case class ImageFeatures(
      doc_id: Long, format: String, width: Int, height: Int, channels: Int)

  /** Rows whose payload the codec refused — the quarantine lane a real
    * ingest keeps for triage instead of silently dropping.
    */
  final case class QuarantinedMedia(doc_id: Long, n_bytes: Long)

  private def binaryRows(docs: DataFrame, idCol: String, payloadCol: String) =
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))

  /** REAL batch image decode (javax.imageio): same map-only plumbing as
    * [[decodeFeatures]], but the dimensions/format/band-count are read
    * from the actual encoded bitstream. Undecodable payloads are
    * dropped here; [[quarantineImages]] is their lane.
    */
  def decodeImages(docs: DataFrame, idCol: String, payloadCol: String): Dataset[ImageFeatures] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        ImageCodec.decode(payload).map(m =>
          ImageFeatures(id, m.format, m.width, m.height, m.channels))
      }
    }(Encoders.product[ImageFeatures])

  /** REAL audio codec, zero external deps: WAV/PCM16 via the JDK's own
    * `javax.sound.sampled` — the audio parallel of [[ImageCodec]] (the
    * stub codec remains the video path). Mono 16-bit little-endian at
    * 8 kHz; the generator synthesizes deterministic samples from
    * (index, seed), so an oracle can replay the decoded waveform's
    * exact sample arithmetic without an audio library.
    */
  object AudioCodec {
    val SampleRate = 8000f

    /** Deterministic PCM16 mono WAV: sample i = ((i*31 + seed*17) mod
      * 65536) − 32768. The container is written directly (canonical
      * 44-byte RIFF/WAVE header + data chunk — byte-identical to what
      * `javax.sound.sampled.AudioSystem` emits for this format, which
      * `AudioCodecSpec` cross-checks): `AudioSystem`'s provider
      * registry takes a GLOBAL lock per call, which serialized 32
      * executor threads and made the audio lane the slowest multimodal
      * query at 10× scale; the manual writer/parser is lock-free.
      */
    def encodeWavPcm16(nSamples: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(SampleRate.toInt)
        .putInt(SampleRate.toInt * 2)      // byte rate
        .putShort(2)                       // block align
        .putShort(16)                      // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        buf.putShort((((i.toLong * 31 + seed * 17) % 65536) - 32768).toShort)
        i += 1
      }
      buf.array()
    }

    /** Decode a WAV payload: (n_samples, sample_rate_hz, channels,
      * sum of samples, max |sample|) — None for refused payloads
      * (wrong container, truncated, not PCM16 mono). Chunk-walking
      * RIFF parser: skips unknown chunks (odd sizes padded per spec),
      * requires a PCM16-mono `fmt ` chunk before `data`.
      */
    def decodeWav(payload: Array[Byte]): Option[(Long, Int, Int, Long, Int)] =
      dataChunk(payload).map { case (buf, base, size, sampleRate) =>
        var (i, sum, maxAbs) = (0, 0L, 0)
        while (i < size) {
          val s = buf.getShort(base + i).toInt
          sum += s
          if (math.abs(s) > maxAbs) maxAbs = math.abs(s)
          i += 2
        }
        (size / 2L, sampleRate, 1, sum, maxAbs)
      }

    /** The decoded waveform itself — for stages that reduce windows or
      * transform samples rather than whole-file aggregates.
      */
    def decodeSamples(payload: Array[Byte]): Option[Array[Short]] =
      dataChunk(payload).map { case (buf, base, size, _) =>
        val out = new Array[Short](size / 2)
        var i = 0
        while (i < out.length) { out(i) = buf.getShort(base + 2 * i); i += 1 }
        out
      }

    /** Chunk-walking RIFF parse up to the data chunk: (buffer, data
      * offset, data byte length, sample rate), or None for refused
      * payloads (wrong container, truncated, not PCM16 mono).
      */
    private def dataChunk(payload: Array[Byte]): Option[(java.nio.ByteBuffer, Int, Int, Int)] =
      try {
        if (payload == null || payload.length < 44) return None
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        if (tag() != "RIFF") return None
        buf.getInt // declared riff size; trust actual bounds instead
        if (tag() != "WAVE") return None
        var sampleRate = -1
        while (buf.remaining() >= 8) {
          val id = tag()
          val size = buf.getInt
          if (size < 0 || size > buf.remaining()) return None
          id match {
            case "fmt " =>
              if (size < 16) return None
              val fmtStart = buf.position()
              val audioFormat = buf.getShort
              val channels = buf.getShort
              val rate = buf.getInt
              // PCM16 mono only — anything else is refused, matching
              // the previous AudioSystem-based gate.
              if (audioFormat != 1 || channels != 1) return None
              // bits-per-sample sits after byteRate(4) + blockAlign(2).
              buf.position(fmtStart + 14)
              if (buf.getShort != 16) return None
              // A declared rate ≤ 0 is a malformed header: refuse, so
              // decode-or-quarantine stays exhaustive (the old
              // AudioSystem path also rejected these).
              if (rate <= 0) return None
              sampleRate = rate
              buf.position(fmtStart + size + (size & 1))
            case "data" =>
              if (sampleRate < 0 || size % 2 != 0) return None
              return Some((buf, buf.position(), size, sampleRate))
            case _ =>
              buf.position(buf.position() + size + (size & 1))
          }
        }
        None
      } catch { case _: Exception => None }
  }

  /** One fixed-size analysis window of decoded audio: exact integer
    * energy (Σ sample²) and peak — the primitives under silence
    * trimming / voice-activity gating in an ASR data pipeline.
    */
  final case class AudioWindow(
      doc_id: Long, win_no: Int, n_samples: Long, sum_sq: Long, max_abs: Int)

  /** Windowed audio feature extraction: decode the WAV, reduce each
    * `windowSize`-sample window to exact integer energy/peak — the
    * audio analog of [[videoFrameStats]] (fan-out to typed sub-units
    * with content-pinning arithmetic). Map-only; sample² ≤ 2³⁰ and
    * windows are small, so Σ sample² stays far from Long overflow.
    */
  def audioWindows(docs: DataFrame, idCol: String, payloadCol: String,
      windowSize: Int): Dataset[AudioWindow] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        AudioCodec.decodeSamples(payload).toSeq.flatMap { samples =>
          samples.grouped(windowSize).zipWithIndex.map { case (w, wi) =>
            var (i, sq, mx) = (0, 0L, 0)
            while (i < w.length) {
              val s = w(i)
              sq += s.toLong * s
              if (math.abs(s) > mx) mx = math.abs(s)
              i += 1
            }
            AudioWindow(id, wi, w.length.toLong, sq, mx)
          }
        }
      }
    }(Encoders.product[AudioWindow])

  /** Decoded audio features for (doc_id, payload) rows. */
  final case class AudioFeatures(
      doc_id: Long, n_samples: Long, sample_rate: Int, channels: Int,
      sum_amp: Long, max_amp: Int)

  /** REAL batch audio decode: map-only like [[decodeImages]]; refused
    * payloads are dropped (the quarantine pattern is [[quarantineImages]]'s).
    */
  def decodeAudio(docs: DataFrame, idCol: String, payloadCol: String): Dataset[AudioFeatures] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        AudioCodec.decodeWav(payload).map { case (n, sr, ch, sum, mx) =>
          AudioFeatures(id, n, sr, ch, sum, mx)
        }
      }
    }(Encoders.product[AudioFeatures])

  /** Per-channel pixel sums read from the DECODED raster. */
  final case class ImagePixelStats(
      doc_id: Long, width: Int, height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL feature extraction one level below [[decodeImages]]: decode
    * the bitstream AND reduce the raster — exact per-channel pixel
    * sums. This is the pixel-content proof: a codec that reports the
    * right dimensions but wrong bytes (color-managed, subsampled,
    * lossy) mismatches here. Same map-only plumbing — payloads never
    * shuffle; the output is three longs per image.
    */
  def channelStats(docs: DataFrame, idCol: String, payloadCol: String): Dataset[ImagePixelStats] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        ImageCodec.decodeImage(payload).map { case (m, img) =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < m.height) {
            var x = 0
            while (x < m.width) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          ImagePixelStats(id, m.width, m.height, sr, sg, sb)
        }
      }
    }(Encoders.product[ImagePixelStats])

  // ------------------------------------------------------------------
  // REAL video codec — an MJPEG-style container (frame index + one
  // independently-encoded image per frame) over the JDK-native image
  // path above. No inter-frame prediction: that is exactly the MJPEG
  // family's trade, and it is the only video shape decodable with zero
  // external codec libs. Frames here are PNG (lossless) so the
  // pixel-replay oracle can pin frame CONTENT, not just counts.
  // ------------------------------------------------------------------

  /** One decoded frame's content proof: dimensions + exact per-channel
    * pixel sums read from the decoded raster.
    */
  final case class VideoFrameStats(
      doc_id: Long, frame_no: Int, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Frame-indexed container codec: magic "GVF1", big-endian i32 frame
    * count, then per frame a big-endian i32 length + the encoded image
    * bitstream. Decode REFUSES (None) on wrong magic, truncated index,
    * truncated frame bytes, or any frame the image codec refuses — the
    * quarantine contract of [[ImageCodec]] lifted to containers.
    */
  object VideoCodec {
    private val Magic = Array[Byte]('G', 'V', 'F', '1')

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(baos)
      out.write(Magic)
      out.writeInt(frames.length)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      out.flush()
      baos.toByteArray
    }

    /** Deterministic test-pattern video: frame f is
      * [[ImageCodec.encodePng]] with seed = seed + 131·f, so an oracle
      * replays every frame's pixels arithmetically.
      */
    def encodeVideo(nFrames: Int, width: Int, height: Int, seed: Long): Array[Byte] =
      encode((0 until nFrames).map(f =>
        ImageCodec.encodePng(width, height, seed + 131L * f)))

    /** Parse the container and decode every frame; None = quarantine. */
    def decodeFrames(payload: Array[Byte]): Option[Seq[(Int, ImageMeta, java.awt.image.BufferedImage)]] = {
      if (payload == null || payload.length < 8 ||
        !payload.take(4).sameElements(Magic)) return None
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(payload, 4, payload.length - 4))
      try {
        val n = in.readInt()
        if (n < 0 || n > (1 << 20)) None
        else {
          val frames = Vector.newBuilder[(Int, ImageMeta, java.awt.image.BufferedImage)]
          var f = 0
          var bad = false
          while (f < n && !bad) {
            val len = in.readInt()
            if (len < 0 || len > in.available()) bad = true
            else {
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              ImageCodec.decodeImage(bytes) match {
                case Some((meta, img)) => frames += ((f, meta, img))
                case None => bad = true
              }
            }
            f += 1
          }
          if (bad) None else Some(frames.result())
        }
      } catch { case _: Exception => None }
      finally in.close()
    }
  }

  /** REAL per-frame video feature extraction: parse the container,
    * decode every frame's bitstream, reduce each raster to exact
    * per-channel pixel sums — the video analog of [[channelStats]].
    * Map-only: payloads never shuffle; output is a few longs per
    * frame. Refused containers are dropped here; [[quarantineVideos]]
    * is their lane.
    */
  def videoFrameStats(docs: DataFrame, idCol: String, payloadCol: String): Dataset[VideoFrameStats] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        VideoCodec.decodeFrames(payload).toSeq.flatten.map { case (f, m, img) =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < m.height) {
            var x = 0
            while (x < m.width) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          VideoFrameStats(id, f, m.width, m.height, sr, sg, sb)
        }
      }
    }(Encoders.product[VideoFrameStats])

  /** Complement of [[videoFrameStats]]: containers the codec refused. */
  def quarantineVideos(docs: DataFrame, idCol: String, payloadCol: String): Dataset[QuarantinedMedia] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.collect { case (id, payload) if VideoCodec.decodeFrames(payload).isEmpty =>
        QuarantinedMedia(id, if (payload == null) 0L else payload.length.toLong)
      }
    }(Encoders.product[QuarantinedMedia])

  /** Complement of [[decodeImages]]: the payloads the codec refused. */
  def quarantineImages(docs: DataFrame, idCol: String, payloadCol: String): Dataset[QuarantinedMedia] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.collect { case (id, payload) if ImageCodec.decode(payload).isEmpty =>
        QuarantinedMedia(id, if (payload == null) 0L else payload.length.toLong)
      }
    }(Encoders.product[QuarantinedMedia])

  /** REAL batch resize: decode ONCE → bilinear scale to (w/divisor,
    * h/divisor, floor, min 1) → re-encode PNG → re-decode the (smaller)
    * output to PROVE it is a valid image (the emitted dims come from
    * the re-decoded bitstream, not from arithmetic). Undecodable
    * inputs are dropped (quarantine lane as above).
    */
  def resizeImages(docs: DataFrame, idCol: String, payloadCol: String, divisor: Int): Dataset[ImageFeatures] =
    binaryRows(docs, idCol, payloadCol).mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        for {
          (in, img) <- ImageCodec.decodeImage(payload)
          resized = ImageCodec.scalePng(img,
            math.max(1, in.width / divisor), math.max(1, in.height / divisor))
          out <- ImageCodec.decode(resized)
        } yield ImageFeatures(id, out.format, out.width, out.height, out.channels)
      }
    }(Encoders.product[ImageFeatures])
}
