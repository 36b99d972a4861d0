package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extensions, SURVEY.md §7.2
  * step 8): media payloads travel as opaque `binary` columns with typed
  * metadata; decode / feature-extract runs as batched partition-local
  * processing.
  *
  * Two decoders share the batch plumbing:
  *  - [[ImageCodec]] — a REAL image path on the JDK's `javax.imageio`
  *    (PNG/BMP/GIF readers ship with the JDK; no external codec needed):
  *    [[decodeImages]] for arbitrary image payloads,
  *    [[imageRoundtrip]] for an oracle-provable encode→decode round trip.
  *  - [[FakeDecoder]] — the deterministic STUB standing in for codecs the
  *    JDK genuinely lacks (now only compressed video codec families like
  *    H.26x/VP9/AV1: PNG/BMP/GIF images, animated GIF frames, WAV audio,
  *    and the RIFF/AVI video container with DIB/MJPEG frames
  *    ([[AviCodec]]) all have REAL decode paths); unrecognized payloads
  *    fall back to it.
  *
  * The Spark-side plumbing is identical for both and tested: binary column
  * schema, typed Dataset round-trip, `mapPartitions` with explicit batch
  * shape (the Scala equivalent of `mapInPandas` arrow batches), and
  * deterministic features the DuckDB oracle can recompute from the source
  * bytes.
  *
  * Scale notes: payload processing is embarrassingly parallel — no
  * shuffle, one pass per partition; batch size bounds peak memory per
  * task regardless of document size skew. At 100 TB the payloads would be
  * read from a binary-file DataSource with the same downstream shape.
  */
object Multimodal {

  /** One decoded asset batch row. `checksum` is a running byte sum mod 997
    * (== total mod 997, so SQL can verify it with SUM over code points). */
  final case class AssetFeatures(
      doc_id: Long, n_bytes: Long, head_byte: Long, tail_byte: Long, checksum: Long)

  // NOT private: Catalyst's generated deserializer needs public access.
  final case class AssetRow(doc_id: Long, payload: Array[Byte])

  /** STUB decoder — stands in for image/audio decode (libs absent here).
    * Deterministic features of the raw bytes; a real deployment swaps this
    * body for the codec call and keeps the batch plumbing unchanged. */
  object FakeDecoder {
    val BatchSize = 64
    def decode(a: AssetRow): AssetFeatures = {
      val b = a.payload
      AssetFeatures(
        doc_id = a.doc_id,
        n_bytes = b.length.toLong,
        head_byte = if (b.nonEmpty) (b(0) & 0xff).toLong else -1L,
        tail_byte = if (b.nonEmpty) (b(b.length - 1) & 0xff).toLong else -1L,
        checksum = b.foldLeft(0L)((acc, x) => (acc + (x & 0xff)) % 997))
    }
  }

  /** REAL image decode on `javax.imageio` — pure-JVM, deterministic for
    * the lossless formats whose readers ship with every JDK (PNG, BMP,
    * GIF). Encoding is included so a corpus of plain bytes can be lifted
    * into genuine image payloads and the decode proven faithful against a
    * byte-level oracle ([[imageRoundtrip]]). */
  object ImageCodec {
    // ImageIO's stream cache defaults to DISK: every read/write spins up
    // a temp FILE (FileCacheImageInput/OutputStream) — per payload, per
    // row. Sequentially that is hidden syscall overhead; across a wide
    // codec stage it is filesystem contention that made the parallel
    // decode SLOWER than single-task (measured: imageRoundtrip 1.6 s
    // 1-task → 6-7 s at 32 tasks with the disk cache; memory-cached
    // streams restore the parallel win). Payloads here are KB-scale, so
    // memory caching is strictly cheaper. JVM-global, set once at codec
    // init on whichever side (driver/executor) first touches the codec.
    javax.imageio.ImageIO.setUseCache(false)
    val BatchSize = 64

    /** Fixed row width for [[encodeGrayPng]] — payload bytes pack
      * row-major into a `RowWidth`-wide 8-bit grayscale raster. */
    val RowWidth = 16

    /** Encode raw bytes as a real 8-bit grayscale PNG: bytes fill a
      * `width`-wide raster row-major, the last row zero-padded. PNG gray-8
      * is lossless, so decoding recovers every byte exactly. */
    def encodeGrayPng(bytes: Array[Byte], width: Int = RowWidth): Array[Byte] = {
      require(width > 0, s"image width must be positive, got $width")
      val h = math.max((bytes.length + width - 1) / width, 1)
      val img = new java.awt.image.BufferedImage(
        width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < bytes.length) {
        raster.setSample(i % width, i / width, 0, bytes(i) & 0xff)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode an image payload; None when no JDK reader recognizes the
      * bytes (the caller falls back to [[FakeDecoder]]). */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      Option(
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null })

    /** FNV-1a over the ARGB pixel stream, row-major — a deterministic
      * whole-image fingerprint (getRGB normalizes every color model to
      * default-sRGB ARGB, so the hash is stable across gray/RGB sources). */
    def pixelHash(img: java.awt.image.BufferedImage): Long = {
      var h = -3750763034362895579L // FNV-1a 64-bit offset basis
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          h ^= img.getRGB(x, y).toLong & 0xffffffffL
          h *= 1099511628211L // FNV-1a 64-bit prime
          x += 1
        }
        y += 1
      }
      h
    }
  }

  /** REAL multi-frame (animated) image codec on the JDK's own GIF
    * writer/reader — the frame-level decode path: a payload encodes as an
    * animated GIF (one frame per fixed-size byte window) and decodes back
    * frame by frame through `javax.imageio`, so "frames" are genuine
    * decoded rasters, not byte windows. */
  object GifCodec {
    javax.imageio.ImageIO.setUseCache(false) // see ImageCodec — disk-cache contention
    val BatchSize = 32
    val FrameWidth = 16
    val FrameHeight = 4
    /** Bytes per frame — one full `FrameWidth`×`FrameHeight` raster. */
    val FrameBytes: Int = FrameWidth * FrameHeight

    /** Identity 256-gray palette: palette[i] = (i,i,i). TYPE_BYTE_INDEXED
      * with an explicit sRGB gray ramp sidesteps TYPE_BYTE_GRAY's
      * linear-gray color management (getRGB would gamma-map samples);
      * here the decoded `getRGB & 0xff` IS the original byte, whatever
      * index order the writer's palette ends up in. */
    private val grayPalette: java.awt.image.IndexColorModel = {
      val ramp = Array.tabulate(256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    /** Encode bytes as a genuine animated GIF: each `FrameBytes` window
      * fills one full-size frame row-major (last frame zero-padded),
      * written through the JDK GIF writer's multi-frame sequence API. */
    def encodeAnimatedGif(bytes: Array[Byte]): Array[Byte] = {
      require(bytes.nonEmpty, "cannot encode an empty payload as a GIF")
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        // The JDK GIF writer interlaces by default and mis-lays rows for
        // rasters this short (rows permute and the last is lost — verified
        // empirically); progressive off makes the trip byte-exact.
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        writer.prepareWriteSequence(null)
        bytes.grouped(FrameBytes).foreach { chunk =>
          val img = new java.awt.image.BufferedImage(
            FrameWidth, FrameHeight, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
          val raster = img.getRaster
          var i = 0
          while (i < chunk.length) {
            raster.setSample(i % FrameWidth, i / FrameWidth, 0, chunk(i) & 0xff)
            i += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      bos.toByteArray
    }

    /** Every frame of a multi-frame payload through the real JDK reader. */
    def decodeFrames(payload: Array[Byte]): Vector[java.awt.image.BufferedImage] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no JDK reader recognizes the payload")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          (0 until reader.getNumImages(true)).map(reader.read).toVector
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** One decoded GIF frame — dimensions from the decoded raster, checksum
    * over the decoded pixels (zero pad excluded via the known byte count). */
  final case class GifFrame(
      doc_id: Long, frame_idx: Long, frame_w: Int, frame_h: Int,
      n_bytes: Long, checksum: Long)

  /** Frame-level REAL decode, the animated twin of [[imageRoundtrip]]:
    * each document's bytes become an actual animated GIF and come back
    * through `javax.imageio` frame by frame; every emitted feature is
    * taken from the DECODED side (frame count from the reader, dims and
    * checksum from each decoded raster). The identity-gray palette makes
    * the trip lossless, so DuckDB recomputes the per-frame checksums from
    * the source text — a real frame-level decode under a byte-level
    * oracle. Empty payloads emit zero frames (mirrored by the oracle's
    * empty range). */
  def gifFrames(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadPayloads(docs) // heavy codec stage — see spreadPayloads
      .as[AssetRow]
      .mapPartitions { it =>
        it.grouped(GifCodec.BatchSize).flatMap { batch =>
          batch.iterator.flatMap { a =>
            if (a.payload.isEmpty) Iterator.empty
            else {
              val frames = GifCodec.decodeFrames(GifCodec.encodeAnimatedGif(a.payload))
              val expected =
                (a.payload.length + GifCodec.FrameBytes - 1) / GifCodec.FrameBytes
              require(frames.length == expected,
                s"doc ${a.doc_id}: GIF reader returned ${frames.length} frames, expected $expected")
              frames.iterator.zipWithIndex.map { case (img, idx) =>
                val n = math.min(
                  GifCodec.FrameBytes, a.payload.length - idx * GifCodec.FrameBytes)
                var sum = 0L
                var i = 0
                while (i < n) {
                  sum = (sum + (img.getRGB(i % img.getWidth, i / img.getWidth) & 0xff)) % 997
                  i += 1
                }
                GifFrame(a.doc_id, idx.toLong, img.getWidth, img.getHeight, n.toLong, sum)
              }
            }
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** REAL audio codec on `javax.sound.sampled` — the JDK ships a WAV
    * reader, so like [[ImageCodec]] this needs zero external libraries.
    * 8-bit unsigned PCM mono is lossless: the decoded sample stream IS the
    * source byte stream, which is what lets a real encode+decode pair be
    * oracle-gated end to end ([[audioRoundtrip]]). */
  object WavCodec {
    val BatchSize = 64

    /** Fixed nominal rate for [[encodePcmWav]] — 8 kHz telephony mono. */
    val SampleRate = 8000

    /** Encode raw bytes as a genuine RIFF/WAVE payload: 44-byte canonical
      * header + the bytes as 8-bit unsigned PCM samples. */
    def encodePcmWav(bytes: Array[Byte], sampleRate: Int = SampleRate): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + bytes.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + bytes.length)
      bb.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16).putShort(1).putShort(1) // PCM, mono
      bb.putInt(sampleRate).putInt(sampleRate) // byte rate = rate · 1 ch · 1 B
      bb.putShort(1).putShort(8) // block align, bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(bytes.length).put(bytes)
      bb.array()
    }

    /** Decode through the JDK's real WAV reader: format + raw sample
      * bytes, or None if the payload isn't a recognized audio container
      * (the caller falls back to [[FakeDecoder]]). */
    def decode(payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try Some((in.getFormat, in.readAllBytes())) finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One decoded audio row — features from the DECODED stream only. */
  final case class AudioRow(
      doc_id: Long, sample_rate: Long, n_samples: Long, duration_ms: Long,
      checksum: Long)

  /** Oracle-provable REAL-codec audio round trip, the WAV twin of
    * [[imageRoundtrip]]: bytes → genuine RIFF/WAVE → decoded back through
    * `javax.sound.sampled`, every emitted feature taken from the decoded
    * side (rate/length from the reader, checksum over the decoded
    * samples). Losslessness of 8-bit PCM makes the checksum equal the
    * source bytes' [[FakeDecoder]] checksum, which DuckDB recomputes from
    * the text — gating a real audio decode without any external codec. */
  def audioRoundtrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    assets(docs)
      .select(col("doc_id"), col("payload"))
      .as[AssetRow]
      .mapPartitions { it =>
        it.grouped(WavCodec.BatchSize).flatMap { batch =>
          batch.iterator.map { a =>
            val wav = WavCodec.encodePcmWav(a.payload)
            val (fmt, samples) = WavCodec.decode(wav).getOrElse(
              throw new IllegalStateException(s"JDK WAV reader failed on doc ${a.doc_id}"))
            val rate = fmt.getSampleRate.toLong
            var sum = 0L
            var i = 0
            while (i < samples.length) { sum = (sum + (samples(i) & 0xff)) % 997; i += 1 }
            AudioRow(a.doc_id, rate, samples.length.toLong,
              samples.length.toLong * 1000L / rate, sum)
          }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** One decoded image row. Non-image payloads take the [[FakeDecoder]]
    * fallback: dims −1, `pixel_hash` the fake checksum, `decoded` false. */
  final case class ImageFeatures(
      doc_id: Long, width: Int, height: Int, n_pixels: Long,
      pixel_hash: Long, decoded: Boolean)

  /** Batched REAL image decode over binary payloads: each batch's payloads
    * run through `javax.imageio`; recognized images emit true dimensions +
    * a pixel-stream fingerprint, unrecognized payloads degrade to the
    * byte-level stub features (flagged, never dropped — a corrupt blob at
    * 100 TB must surface in the output, not vanish). Partition-local, no
    * shuffle; [[ImageCodec.BatchSize]] bounds per-task peak memory. */
  def decodeImages(assetFrame: DataFrame): DataFrame = {
    val spark = assetFrame.sparkSession
    import spark.implicits._
    assetFrame
      .select(col("doc_id"), col("payload"))
      .as[AssetRow]
      .mapPartitions { it =>
        it.grouped(ImageCodec.BatchSize).flatMap { batch =>
          batch.iterator.map { a =>
            ImageCodec.decode(a.payload) match {
              case Some(img) =>
                ImageFeatures(a.doc_id, img.getWidth, img.getHeight,
                  img.getWidth.toLong * img.getHeight,
                  ImageCodec.pixelHash(img), decoded = true)
              case None =>
                val f = FakeDecoder.decode(a)
                ImageFeatures(a.doc_id, -1, -1, -1L, f.checksum, decoded = false)
            }
          }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Oracle-provable REAL-codec round trip: each document's bytes are
    * encoded as a genuine grayscale PNG and decoded back through
    * `javax.imageio`, and the emitted features come from the DECODED
    * raster alone — width/height from the image header, checksum from the
    * first `n_bytes` decoded samples (the zero pad is excluded). PNG
    * gray-8 is lossless, so the checksum must equal the source bytes'
    * [[FakeDecoder]] checksum — which DuckDB recomputes from the text,
    * making a real encode+decode pair oracle-gated end to end. */
  final case class RoundtripRow(
      doc_id: Long, img_w: Int, img_h: Int, n_bytes: Long, checksum: Long)

  def imageRoundtrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadPayloads(docs) // heavy codec stage — see spreadPayloads
      .as[AssetRow]
      .mapPartitions { it =>
        it.grouped(ImageCodec.BatchSize).flatMap { batch =>
          batch.iterator.map { a =>
            val png = ImageCodec.encodeGrayPng(a.payload)
            val img = ImageCodec.decode(png).getOrElse(
              throw new IllegalStateException(s"JDK PNG reader failed on doc ${a.doc_id}"))
            val raster = img.getRaster
            var sum = 0L
            var i = 0
            while (i < a.payload.length) {
              sum = (sum + raster.getSample(i % img.getWidth, i / img.getWidth, 0)) % 997
              i += 1
            }
            RoundtripRow(a.doc_id, img.getWidth, img.getHeight, a.payload.length.toLong, sum)
          }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** The asset table: documents' text bytes posing as media payloads —
    * binary column + typed metadata, the schema a real multimodal corpus
    * would carry. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/x-fake").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** The (doc_id, payload) slice of [[assets]] spread for a HEAVY codec
    * stage (guide §2.5): the imageio/AVI encode+decode pipelines cost
    * seconds of CPU per MB and a one-file corpus scans as a single task,
    * so they ran single-threaded at local[32]. Applied only at the real
    * codec entries — the byte-cheap paths (FakeDecoder, frame slicing,
    * WAV) measured FASTER unspread (the exchange + extra stage costs
    * more than their per-row work). */
  private def spreadPayloads(docs: DataFrame): DataFrame =
    SkewUtils.spreadComputeSized(
      assets(docs).select(col("doc_id"), col("payload")),
      SkewUtils.CodecBytesPerTask, col("doc_id"))

  /** One sampled frame of a payload (video-frame-sampling shape): payloads
    * chop into fixed `frameSize` windows, every `every`-th frame is kept
    * with deterministic per-frame features. */
  final case class Frame(doc_id: Long, frame_idx: Long, n_bytes: Long, checksum: Long)

  /** Frame sampling over binary payloads — the media pipeline's
    * decode→sample step as partition-local typed processing (a real codec
    * would decode before slicing; the slicing/sampling plumbing is what's
    * exercised here). */
  def frameSample(docs: DataFrame, frameSize: Int = 32, every: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    assets(docs)
      .select(col("doc_id"), col("payload"))
      .as[AssetRow]
      .mapPartitions { it =>
        it.flatMap { a =>
          a.payload.grouped(frameSize).zipWithIndex.collect {
            case (frame, idx) if idx % every == 0 =>
              Frame(a.doc_id, idx.toLong, frame.length.toLong,
                frame.foldLeft(0L)((acc, x) => acc + (x & 0xff)) % 997)
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** REAL video-container codec — RIFF/AVI, written and demuxed here
    * byte-for-byte (the JDK ships no AVI reader, so the container layer
    * itself is the implementation): `hdrl` (avih + strl{strh,strf}) /
    * `movi` / `idx1` structure, little-endian sizes, even-byte chunk
    * padding, bottom-up DIB row order. Two frame codecs ride the same
    * container:
    *  - uncompressed 8-bit DIB (`00db`, BI_RGB + identity gray palette) —
    *    lossless, so frame-level decode is provable against a byte-level
    *    oracle exactly like [[GifCodec]];
    *  - MJPEG (`00dc`, biCompression='MJPG') through the JDK's real JPEG
    *    writer/reader — a genuinely compressed video stream, spec-gated
    *    on structure + bounded pixel error (JPEG is lossy by design).
    * After this, [[FakeDecoder]] stands in only for the compressed video
    * codec families the JVM genuinely lacks (H.26x/VP9/AV1). */
  object AviCodec {
    javax.imageio.ImageIO.setUseCache(false) // see ImageCodec — disk-cache contention
    val BatchSize = 32
    val FrameWidth = 16
    val FrameHeight = 4
    /** Bytes per frame; stride = FrameWidth is already 4-byte aligned. */
    val FrameBytes: Int = FrameWidth * FrameHeight
    val Fps = 25

    import java.nio.{ByteBuffer, ByteOrder}
    private def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    private def fcc(s: String): Array[Byte] = {
      require(s.length == 4, s"FOURCC must be 4 bytes: '$s'")
      s.getBytes("US-ASCII")
    }
    /** `id ++ size ++ data`, padded to an even byte boundary (RIFF rule —
      * the pad byte is NOT counted in the stored size). */
    private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val bb = le(8 + data.length + (data.length & 1))
      bb.put(fcc(id)).putInt(data.length).put(data)
      bb.array()
    }
    private def list(kind: String, payload: Array[Byte]): Array[Byte] = {
      val bb = le(12 + payload.length)
      bb.put(fcc("LIST")).putInt(4 + payload.length).put(fcc(kind)).put(payload)
      bb.array()
    }

    /** One demuxed payload: header-declared geometry + the raw codec data
      * of every video frame chunk, in stream order. */
    final case class Demuxed(
        width: Int, height: Int, totalFrames: Int, handler: String,
        bitCount: Int, frames: Vector[Array[Byte]])

    private def aviHeaders(handler: String, frames: Int,
                           maxChunk: Int, strf: Array[Byte]): Array[Byte] = {
      val avih = le(56)
        .putInt(1000000 / Fps).putInt(maxChunk * Fps).putInt(0)
        .putInt(0x10 /* AVIF_HASINDEX */).putInt(frames).putInt(0)
        .putInt(1).putInt(maxChunk).putInt(FrameWidth).putInt(FrameHeight)
        .putInt(0).putInt(0).putInt(0).putInt(0).array()
      val strh = le(56)
        .put(fcc("vids")).put(fcc(handler)).putInt(0).putInt(0)
        .putInt(0).putInt(1).putInt(Fps).putInt(0).putInt(frames)
        .putInt(maxChunk).putInt(0).putInt(0)
        .putShort(0).putShort(0)
        .putShort(FrameWidth.toShort).putShort(FrameHeight.toShort).array()
      list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    }

    private def bitmapInfo(bitCount: Int, compression: Int,
                           palette: Array[Byte]): Array[Byte] = {
      val bb = le(40 + palette.length)
      bb.putInt(40).putInt(FrameWidth).putInt(FrameHeight).putShort(1)
        .putShort(bitCount.toShort).putInt(compression).putInt(FrameBytes)
        .putInt(0).putInt(0).putInt(if (palette.isEmpty) 0 else 256).putInt(0)
        .put(palette)
      bb.array()
    }

    private def assemble(handler: String, frameId: String,
                         strf: Array[Byte], frameChunks: Seq[Array[Byte]]): Array[Byte] = {
      val maxChunk = if (frameChunks.isEmpty) 0 else frameChunks.map(_.length).max
      val movi = {
        val enc = frameChunks.map(chunk(frameId, _))
        list("movi", enc.toArray.flatten)
      }
      // idx1 offsets are relative to the 'movi' FOURCC; first chunk at 4.
      val idx = le(16 * frameChunks.length)
      var off = 4
      frameChunks.foreach { f =>
        idx.put(fcc(frameId)).putInt(0x10 /* AVIIF_KEYFRAME */).putInt(off).putInt(f.length)
        off += 8 + f.length + (f.length & 1)
      }
      val body = fcc("AVI ") ++
        aviHeaders(handler, frameChunks.length, maxChunk, strf) ++
        movi ++ chunk("idx1", idx.array())
      le(8 + body.length).put(fcc("RIFF")).putInt(body.length).put(body).array()
    }

    /** Encode raw bytes as an uncompressed-DIB AVI: each [[FrameBytes]]
      * window is one 8-bit frame (last zero-padded), rows stored
      * BOTTOM-UP per the DIB convention, identity gray palette. */
    def encodeDibAvi(bytes: Array[Byte]): Array[Byte] = {
      require(bytes.nonEmpty, "cannot encode an empty payload as an AVI")
      val palette = Array.tabulate(1024) { i => // RGBQUAD (b,g,r,0) = (i,i,i,0)
        if (i % 4 == 3) 0.toByte else (i / 4).toByte
      }
      val frames = bytes.grouped(FrameBytes).map { window =>
        val dib = new Array[Byte](FrameBytes)
        var y = 0
        while (y < FrameHeight) {
          val srcRow = (FrameHeight - 1 - y) * FrameWidth // bottom-up
          var x = 0
          while (x < FrameWidth) {
            val src = srcRow + x
            dib(y * FrameWidth + x) = if (src < window.length) window(src) else 0
            x += 1
          }
          y += 1
        }
        dib
      }.toSeq
      assemble("DIB ", "00db", bitmapInfo(8, 0, palette), frames)
    }

    /** Encode raw bytes as a REAL MJPEG AVI: each window becomes a
      * grayscale raster JPEG-compressed by the JDK's own writer. */
    def encodeMjpegAvi(bytes: Array[Byte]): Array[Byte] = {
      require(bytes.nonEmpty, "cannot encode an empty payload as an AVI")
      val mjpg = le(4).put(fcc("MJPG")).array()
      val frames = bytes.grouped(FrameBytes).map { window =>
        val img = new java.awt.image.BufferedImage(
          FrameWidth, FrameHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < window.length) {
          raster.setSample(i % FrameWidth, i / FrameWidth, 0, window(i) & 0xff)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }.toSeq
      assemble("MJPG", "00dc",
        bitmapInfo(24, ByteBuffer.wrap(mjpg).order(ByteOrder.LITTLE_ENDIAN).getInt, Array.empty),
        frames)
    }

    /** Parse the RIFF/AVI container: header geometry + raw frame chunks.
      * Strict — malformed structure throws (callers wanting a fallback
      * use [[tryDemux]]). */
    def demux(payload: Array[Byte]): Demuxed = {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      def four(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      require(bb.remaining >= 12 && four() == "RIFF", "not a RIFF container")
      val riffSize = bb.getInt
      require(riffSize == payload.length - 8, s"RIFF size $riffSize != ${payload.length - 8}")
      require(four() == "AVI ", "not an AVI")
      var width, height, totalFrames, bitCount = -1
      var handler = ""
      val frames = Vector.newBuilder[Array[Byte]]
      var nMovi = 0
      def walk(end: Int, inMovi: Boolean): Unit = {
        while (bb.position() < end) {
          val id = four()
          val size = bb.getInt
          val next = bb.position() + size + (size & 1)
          id match {
            case "LIST" =>
              val kind = four()
              walk(bb.position() + size - 4, inMovi || kind == "movi")
            case "avih" =>
              val p = bb.position()
              totalFrames = bb.getInt(p + 16)
              width = bb.getInt(p + 32); height = bb.getInt(p + 36)
            case "strh" =>
              val p = bb.position()
              val typ = new String(payload.slice(p, p + 4), "US-ASCII")
              require(typ == "vids", s"first stream must be video, got '$typ'")
              handler = new String(payload.slice(p + 4, p + 8), "US-ASCII")
            case "strf" =>
              bitCount = bb.getShort(bb.position() + 14).toInt
            case fid if inMovi && (fid.endsWith("db") || fid.endsWith("dc")) =>
              val a = new Array[Byte](size); bb.get(a); frames += a; nMovi += 1
            case _ => // idx1 / unknown: skip
          }
          bb.position(next)
        }
      }
      walk(payload.length, inMovi = false)
      require(width > 0 && height > 0 && handler.nonEmpty, "missing AVI headers")
      require(nMovi == totalFrames,
        s"movi has $nMovi frame chunks but avih declares $totalFrames")
      Demuxed(width, height, totalFrames, handler, bitCount, frames.result())
    }

    def tryDemux(payload: Array[Byte]): Option[Demuxed] =
      try Some(demux(payload))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Frame-level decode of an uncompressed-DIB AVI: undo the bottom-up
      * row order — each returned array is the frame's top-down gray
      * pixels, which for [[encodeDibAvi]] ARE the source byte window. */
    def decodeDibFrames(payload: Array[Byte]): (Demuxed, Vector[Array[Byte]]) = {
      val d = demux(payload)
      require(d.handler == "DIB " && d.bitCount == 8,
        s"not an 8-bit DIB stream: handler='${d.handler}' bits=${d.bitCount}")
      val decoded = d.frames.map { dib =>
        require(dib.length == d.width * d.height,
          s"frame chunk ${dib.length} B != ${d.width}x${d.height}")
        val out = new Array[Byte](dib.length)
        var y = 0
        while (y < d.height) {
          System.arraycopy(dib, (d.height - 1 - y) * d.width, out, y * d.width, d.width)
          y += 1
        }
        out
      }
      (d, decoded)
    }

    /** Frame-level decode of an MJPEG AVI through the JDK JPEG reader. */
    def decodeMjpegFrames(payload: Array[Byte]): (Demuxed, Vector[java.awt.image.BufferedImage]) = {
      val d = demux(payload)
      require(d.handler == "MJPG", s"not an MJPEG stream: '${d.handler}'")
      val imgs = d.frames.map { jpg =>
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg)))
          .getOrElse(throw new IllegalStateException("JDK JPEG reader failed on frame"))
      }
      (d, imgs)
    }
  }

  /** One decoded video frame — geometry from the demuxed container
    * headers, checksum from the decoded pixel bytes (pad excluded). */
  final case class VideoFrame(
      doc_id: Long, frame_idx: Long, frame_w: Int, frame_h: Int,
      fourcc: String, n_bytes: Long, checksum: Long)

  /** Frame-level REAL video decode, the container twin of [[gifFrames]]:
    * each document's bytes become a genuine RIFF/AVI (uncompressed 8-bit
    * DIB frames) and come back through [[AviCodec.decodeDibFrames]] — the
    * demuxer walks the real chunk structure and the bottom-up row flip is
    * the actual DIB decode step. Losslessness makes every per-frame
    * checksum equal the source byte window's, so DuckDB recomputes them
    * from the text. Empty payloads emit zero frames. */
  def videoFrames(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadPayloads(docs) // heavy codec stage — see spreadPayloads
      .as[AssetRow]
      .mapPartitions { it =>
        it.grouped(AviCodec.BatchSize).flatMap { batch =>
          batch.iterator.flatMap { a =>
            if (a.payload.isEmpty) Iterator.empty
            else {
              val (d, frames) = AviCodec.decodeDibFrames(AviCodec.encodeDibAvi(a.payload))
              val expected =
                (a.payload.length + AviCodec.FrameBytes - 1) / AviCodec.FrameBytes
              require(frames.length == expected,
                s"doc ${a.doc_id}: demuxed ${frames.length} frames, expected $expected")
              frames.iterator.zipWithIndex.map { case (px, idx) =>
                val n = math.min(
                  AviCodec.FrameBytes, a.payload.length - idx * AviCodec.FrameBytes)
                var sum = 0L
                var i = 0
                while (i < n) { sum = (sum + (px(i) & 0xff)) % 997; i += 1 }
                VideoFrame(a.doc_id, idx.toLong, d.width, d.height,
                  d.handler, n.toLong, sum)
              }
            }
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Batched decode over the binary payloads: partition-local, batch shape
    * explicit (`grouped(BatchSize)`), typed in/out. */
  def decodeFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    assets(docs)
      .select(col("doc_id"), col("payload"))
      .as[AssetRow]
      .mapPartitions { it =>
        it.grouped(FakeDecoder.BatchSize).flatMap { batch =>
          batch.iterator.map(FakeDecoder.decode)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
