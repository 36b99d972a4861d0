package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode features: byte length, head/tail bytes, checksum") {
    val docs = Seq((1L, "abc"), (2L, "z")).toDF("doc_id", "text")
    val f = Multimodal.decodeFeatures(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(f(0) === ((1L, 3L, 97L, 99L, (97 + 98 + 99) % 997)))
    assert(f(1) === ((2L, 1L, 122L, 122L, 122L)))
  }

  test("batching handles partitions larger than one batch") {
    val docs = (0L until 300L).map(i => (i, s"doc$i")).toDF("doc_id", "text").repartition(2)
    val f = Multimodal.decodeFeatures(docs)
    assert(f.count() === 300)
    assert(f.select("doc_id").distinct().count() === 300)
  }

  test("asset table carries binary payload + typed metadata") {
    val a = Multimodal.assets(Seq((1L, "hi")).toDF("doc_id", "text")).collect().head
    assert(a.getAs[Array[Byte]]("payload").toSeq === "hi".getBytes("UTF-8").toSeq)
    assert(a.getAs[Long]("n_bytes") === 2L)
    assert(a.getAs[String]("media_type") === "application/x-fake")
  }

  /** A real image fixture: known per-pixel values, encoded by the JDK's
    * own writer — both PNG and BMP readers ship with javax.imageio. */
  private def fixture(w: Int, h: Int, format: String,
                      rgb: (Int, Int) => Int): (Array[Byte], java.awt.image.BufferedImage) = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"JDK must ship a $format writer")
    (bos.toByteArray, img)
  }

  test("REAL decode: a JDK-decoded PNG and BMP report true dims + the source raster's pixel hash") {
    val (pngBytes, pngImg) = fixture(5, 4, "png", (x, y) => (x * 37 + y * 11) % 0xffffff)
    val (bmpBytes, bmpImg) = fixture(3, 7, "bmp", (x, y) => (x * 101 + y * 53 + 9) % 0xffffff)
    val docsLike = Seq((1L, pngBytes), (2L, bmpBytes), (3L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(docsLike).collect()
      .map(r => r.getLong(0) -> r).toMap
    // PNG and BMP are lossless: the decoded pixel hash must equal the hash
    // of the PRE-encode raster, computed independently of the decode path.
    assert(out(1L).getInt(1) === 5 && out(1L).getInt(2) === 4)
    assert(out(1L).getLong(4) === Multimodal.ImageCodec.pixelHash(pngImg))
    assert(out(1L).getBoolean(5), "PNG payload must take the real-decode path")
    assert(out(2L).getInt(1) === 3 && out(2L).getInt(2) === 7)
    assert(out(2L).getLong(4) === Multimodal.ImageCodec.pixelHash(bmpImg))
    assert(out(2L).getBoolean(5), "BMP payload must take the real-decode path")
    // Unrecognized bytes degrade to the flagged stub features, never drop.
    assert(!out(3L).getBoolean(5) && out(3L).getInt(1) === -1)
    assert(out(3L).getLong(4) ===
      "not an image".getBytes("UTF-8").foldLeft(0L)((a, b) => (a + (b & 0xff)) % 997))
  }

  test("REAL round trip: encode→imageio-decode recovers every byte (checksum from decoded raster)") {
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789"), (2L, "short")).toDF("doc_id", "text")
    val out = Multimodal.imageRoundtrip(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // 36 bytes at width 16 → 16×3 raster; 5 bytes → 16×1.
    assert(out(1L).getInt(1) === 16 && out(1L).getInt(2) === 3 && out(1L).getLong(3) === 36L)
    assert(out(2L).getInt(1) === 16 && out(2L).getInt(2) === 1 && out(2L).getLong(3) === 5L)
    // The checksum is computed from the DECODED samples; lossless codec ⇒
    // it must equal the source-byte checksum the oracle derives from text.
    for ((id, text) <- Seq(1L -> "abcdefghijklmnopqrstuvwxyz0123456789", 2L -> "short"))
      assert(out(id).getLong(4) ===
        text.getBytes("UTF-8").foldLeft(0L)((a, b) => (a + (b & 0xff)) % 997))
  }

  test("REAL WAV codec: encode→javax.sound-decode recovers every byte, incl. 0x00/0xFF") {
    val bytes = (Array(0x00, 0xff, 0x80, 0x7f) ++ "wave-data!".getBytes("UTF-8").map(_ & 0xff))
      .map(_.toByte)
    val wav = Multimodal.WavCodec.encodePcmWav(bytes)
    val Some((fmt, samples)) = Multimodal.WavCodec.decode(wav)
    assert(fmt.getSampleRate === 8000f)
    assert(fmt.getSampleSizeInBits === 8)
    assert(fmt.getChannels === 1)
    assert(fmt.getEncoding === javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
    assert(samples.toSeq === bytes.toSeq, "8-bit PCM must be lossless")
    // Unrecognized bytes are a None, not an exception (fallback seam).
    assert(Multimodal.WavCodec.decode("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("REAL GIF codec: every byte value 0..255 survives the animated encode→decode trip") {
    val bytes = Array.tabulate(256)(_.toByte)
    val frames = Multimodal.GifCodec.decodeFrames(Multimodal.GifCodec.encodeAnimatedGif(bytes))
    assert(frames.length === 4, "256 bytes at 64 per frame = 4 frames")
    assert(frames.forall(f => f.getWidth === 16 && f.getHeight === 4))
    // Reconstruct the byte stream from the DECODED rasters: the identity
    // gray palette must make getRGB & 0xff the original byte, exactly.
    val recovered = frames.zipWithIndex.flatMap { case (img, fi) =>
      (0 until 64).map(i => ((img.getRGB(i % 16, i / 16) & 0xff).toByte))
        .slice(0, math.min(64, bytes.length - fi * 64))
    }
    assert(recovered.toSeq === bytes.toSeq, "lossless frame-level decode")
  }

  test("REAL GIF frames: per-frame decoded features match the source byte windows") {
    val text = "The quick brown fox jumps over the lazy dog 0123456789 repeated once more!"
    val docs = Seq((1L, text), (2L, "tiny")).toDF("doc_id", "text")
    val out = Multimodal.gifFrames(docs).collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    val nb = text.getBytes("UTF-8").length
    assert(d1.length === (nb + 63) / 64, "frame count from the reader")
    d1.foreach { r =>
      val idx = r.getLong(1).toInt
      val chunk = text.getBytes("UTF-8").slice(idx * 64, math.min((idx + 1) * 64, nb))
      assert(r.getInt(2) === 16 && r.getInt(3) === 4)
      assert(r.getLong(4) === chunk.length.toLong)
      assert(r.getLong(5) === chunk.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 997))
    }
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2(0).getLong(4) === 4L)
  }

  test("REAL audio round trip: decoded-sample checksum equals the source-byte checksum") {
    val docs = Seq((1L, "some audio worthy text"), (2L, "x")).toDF("doc_id", "text")
    val out = Multimodal.audioRoundtrip(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 8000L)
    assert(out(1L).getLong(2) === 22L) // n_samples = byte length
    assert(out(1L).getLong(3) === 22L * 1000L / 8000L)
    for ((id, text) <- Seq(1L -> "some audio worthy text", 2L -> "x"))
      assert(out(id).getLong(4) ===
        text.getBytes("UTF-8").foldLeft(0L)((a, b) => (a + (b & 0xff)) % 997))
  }

  test("REAL AVI container: every byte value 0..255 survives the DIB encode→demux→decode trip") {
    import Multimodal.AviCodec
    // all 256 values (incl. 0x00/0xFF), length NOT a frame multiple
    val bytes = (0 until 256).map(_.toByte).toArray ++ Array[Byte](7, 0, -1)
    val (d, frames) = AviCodec.decodeDibFrames(AviCodec.encodeDibAvi(bytes))
    assert(d.width === AviCodec.FrameWidth && d.height === AviCodec.FrameHeight)
    assert(d.handler === "DIB " && d.bitCount === 8)
    val expected = (bytes.length + AviCodec.FrameBytes - 1) / AviCodec.FrameBytes
    assert(d.totalFrames === expected && frames.length === expected)
    val roundtrip = frames.flatten.take(bytes.length)
    assert(roundtrip.toSeq === bytes.toSeq, "DIB frames must be byte-lossless")
    // the zero pad of the last frame is real zero, not garbage
    assert(frames.last.drop(bytes.length - (expected - 1) * AviCodec.FrameBytes)
      .forall(_ === 0.toByte))
  }

  test("AVI demux rejects malformed containers instead of mis-decoding") {
    import Multimodal.AviCodec
    assert(AviCodec.tryDemux("definitely not an avi".getBytes("UTF-8")).isEmpty)
    assert(AviCodec.tryDemux(Array.empty[Byte]).isEmpty)
    val good = AviCodec.encodeDibAvi(Array.tabulate(100)(_.toByte))
    assert(AviCodec.tryDemux(good).nonEmpty)
    assert(AviCodec.tryDemux(good.dropRight(9)).isEmpty, "truncated RIFF size must fail")
    val wrongMagic = good.clone(); wrongMagic(8) = 'X'.toByte
    assert(AviCodec.tryDemux(wrongMagic).isEmpty, "non-AVI RIFF must fail")
  }

  test("REAL MJPEG AVI: JDK-JPEG frames demux with exact geometry and bounded pixel error") {
    import Multimodal.AviCodec
    // smooth-ish payload (JPEG-friendly) long enough for odd-size chunks
    val bytes = Array.tabulate(AviCodec.FrameBytes * 3 + 17)(i => ((i / 2) % 256).toByte)
    val avi = AviCodec.encodeMjpegAvi(bytes)
    val (d, imgs) = AviCodec.decodeMjpegFrames(avi)
    val expected = (bytes.length + AviCodec.FrameBytes - 1) / AviCodec.FrameBytes
    assert(d.handler === "MJPG" && d.totalFrames === expected && imgs.length === expected)
    // odd-length JPEG chunks exercise the RIFF even-byte padding rule
    assert(d.frames.exists(_.length % 2 === 1), "fixture should contain an odd-size chunk")
    var errSum = 0L; var n = 0
    imgs.zipWithIndex.foreach { case (img, idx) =>
      assert(img.getWidth === AviCodec.FrameWidth && img.getHeight === AviCodec.FrameHeight)
      val m = math.min(AviCodec.FrameBytes, bytes.length - idx * AviCodec.FrameBytes)
      for (i <- 0 until m) {
        val src = bytes(idx * AviCodec.FrameBytes + i) & 0xff
        // raster samples, not getRGB: TYPE_BYTE_GRAY's color management
        // would gamma-map the decoded luma and swamp the codec error
        val dec = img.getRaster.getSample(i % img.getWidth, i / img.getWidth, 0)
        errSum += math.abs(src - dec); n += 1
      }
    }
    assert(errSum.toDouble / n < 24.0, s"mean |err| ${errSum.toDouble / n} too high for JPEG")
    // the JDK JPEG codec is deterministic: a second trip is bit-identical
    assert(AviCodec.encodeMjpegAvi(bytes).toSeq === avi.toSeq)
  }

  test("REAL video frames: per-frame demuxed features match the source byte windows") {
    val docs = Seq(
      (1L, "The RIFF container walks LISTs, not vibes. " * 4),
      (2L, "tiny"),
      (3L, "")).toDF("doc_id", "text")
    val out = Multimodal.videoFrames(docs).collect()
    assert(!out.exists(_.getLong(0) == 3L), "empty payload emits zero frames")
    val byDoc = out.groupBy(_.getLong(0))
    for ((id, text) <- Seq(1L -> ("The RIFF container walks LISTs, not vibes. " * 4), 2L -> "tiny")) {
      val bytes = text.getBytes("UTF-8")
      val rows = byDoc(id).sortBy(_.getLong(1))
      assert(rows.length === (bytes.length + 63) / 64)
      rows.foreach { r =>
        val idx = r.getLong(1).toInt
        val window = bytes.slice(idx * 64, math.min(idx * 64 + 64, bytes.length))
        assert(r.getInt(2) === 16 && r.getInt(3) === 4 && r.getString(4) === "DIB ")
        assert(r.getLong(5) === window.length.toLong)
        assert(r.getLong(6) === window.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 997))
      }
    }
  }
}
