package graft

import javax.imageio.ImageIO

import graft.llm.Multimodal

class MultimodalSpec extends SparkSpec {

  test("encodeBmp produces a real BMP that ImageIO decodes faithfully") {
    val payload = "Hello, BMP world! 0123456789abcdef".getBytes("UTF-8")
    val img = ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.encodeBmp(payload)))
    assert(img != null, "ImageIO returned null — not a valid BMP")
    assert(img.getWidth == 4)
    // 34 bytes / 12 bytes-per-row → 3 rows
    assert(img.getHeight == 3)
    // bottom-left pixel carries payload[0..2] as B,G,R
    val c = img.getRGB(0, img.getHeight - 1)
    assert((c & 0xff) == payload(0))          // blue  = 'H'
    assert(((c >> 8) & 0xff) == payload(1))   // green = 'e'
    assert(((c >> 16) & 0xff) == payload(2))  // red   = 'l'
    // sum of decoded channels == payload byte sum (zero padding adds 0)
    var s = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    assert(s == payload.map(_ & 0xff).map(_.toLong).sum)
  }

  test("encodeBmp handles the empty payload (one all-zero row)") {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.encodeBmp(Array.emptyByteArray)))
    assert(img != null && img.getWidth == 4 && img.getHeight == 1)
    assert((img.getRGB(0, 0) & 0xffffff) == 0) // all channels zero
  }

  test("m01 decoded byte_sum matches raw payload sum on the fixture") {
    val rows = Multimodal.m01DecodeFeatures(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // cross-check one row against the raw table, independent of the oracle
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(20).foreach { r =>
      val txt = docs(r.getLong(0))
      val bytes = txt.getBytes("UTF-8")
      assert(r.getLong(1) == bytes.length, s"n_bytes for doc ${r.getLong(0)}")
      assert(r.getLong(3) == bytes.map(_ & 0xff).map(_.toLong).sum,
        s"byte_sum for doc ${r.getLong(0)}")
    }
  }

  test("m03 corner pixels are position-correct on the fixture") {
    val rows = Multimodal.m03ImageDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(20).foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      def b(i: Int): Int = if (bytes.length > i) bytes(i) & 0xff else 0
      assert(r.getInt(4) == b(2), s"corner_r doc ${r.getLong(0)}")
      assert(r.getInt(5) == b(1), s"corner_g doc ${r.getLong(0)}")
      assert(r.getInt(6) == b(0), s"corner_b doc ${r.getLong(0)}")
      assert(r.getInt(2) == math.max(1, (bytes.length + 11) / 12),
        s"img_height doc ${r.getLong(0)}")
    }
  }

  test("encodeWav produces a real WAV that AudioSystem decodes faithfully, signs included") {
    // planted s16le samples incl. negative values (a non-ASCII case the
    // fixture can't reach): 1000, -1000, 32767, -32768, 0
    val samples = Seq[Short](1000, -1000, 32767, -32768, 0)
    val payload = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      payload(2 * i) = (s & 0xff).toByte
      payload(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(Multimodal.encodeWav(payload)))
    assert(ais.getFormat.getSampleSizeInBits == 16 && !ais.getFormat.isBigEndian)
    assert(ais.getFrameLength == samples.length)
    val pcm = ais.readAllBytes()
    val decoded = (0 until samples.length).map(i =>
      (((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort))
    assert(decoded == samples)
    // empty payload → zero-frame WAV, still a decodable container
    val empty = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(Multimodal.encodeWav(Array.empty[Byte])))
    assert(empty.getFrameLength == 0)
  }

  test("m04 decoded energy/peak match the raw payload; silence detection fires on planted silence") {
    import spark.implicits._
    val rows = Multimodal.m04AudioFeatures(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(20).foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      val n = bytes.length / 2
      val ss = (0 until n).map(i =>
        ((bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)).toShort.toInt)
      assert(r.getLong(1) == n.toLong, s"n_samples doc ${r.getLong(0)}")
      assert(r.getLong(3) == ss.map(s => s.toLong * s).sum, s"energy doc ${r.getLong(0)}")
      assert(r.getInt(4) == (if (ss.isEmpty) 0 else ss.map(math.abs).max),
        s"peak doc ${r.getLong(0)}")
      assert(r.getLong(2) == (n + 63) / 64, s"n_frames doc ${r.getLong(0)}")
    }
    // planted silence: 200 near-zero samples (byte 0x01 pairs → s=257,
    // mean square 66049 << 2^26) → all 4 frames silent
    val dir = java.nio.file.Files.createTempDirectory("m04").toString
    val quiet = "\u0001" * 400
    Seq((1L, quiet, "en", "s", 400L), (2L, "loud " * 80, "en", "s", 400L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Multimodal.m04AudioFeatures(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(planted(1L).getLong(2) == 4 && planted(1L).getLong(5) == 4,
      "all-quiet doc: every frame silent")
    assert(planted(2L).getLong(5) == 0, "loud doc: no silent frames")
  }

  test("encodeGif produces a real multi-frame GIF the JDK codec decodes losslessly, high bytes included") {
    // 40 bytes incl. values > 0x7f (beyond the ASCII fixture's reach)
    val payload = (0 until 40).map(i => ((i * 7 + 200) % 256).toByte).toArray
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(Multimodal.encodeGif(payload))))
    assert(rd.getNumImages(true) == 3) // ceil(40/16)
    for (f <- 0 until 3) {
      val img = rd.read(f)
      assert(img.getWidth == 4 && img.getHeight == 4)
      for (y <- 0 until 4; x <- 0 until 4) {
        val idx = f * 16 + y * 4 + x
        val want = if (idx < payload.length) payload(idx) & 0xff else 0
        assert(((img.getRGB(x, y) >> 16) & 0xff) == want,
          s"frame $f pixel ($x,$y)")
      }
    }
    rd.dispose()
    // empty payload → one all-zero frame, still a decodable container
    val rd2 = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rd2.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(Multimodal.encodeGif(Array.empty[Byte]))))
    assert(rd2.getNumImages(true) == 1)
    rd2.dispose()
  }

  test("m05 sampled frames match raw payload slices on the fixture") {
    val rows = Multimodal.m05VideoFrames(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(40).foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      val f = r.getInt(1)
      assert(f % 3 == 0, "sampled cadence")
      assert(r.getLong(2) == math.max(1, (bytes.length + 15) / 16),
        s"n_frames doc ${r.getLong(0)}")
      val slice = (f * 16 until f * 16 + 16)
        .map(i => if (i < bytes.length) bytes(i) & 0xff else 0)
      assert(r.getLong(3) == slice.map(_.toLong).sum,
        s"px_sum doc ${r.getLong(0)} frame $f")
      assert(r.getInt(4) == slice.head, s"corner doc ${r.getLong(0)} frame $f")
    }
  }

  test("m06 resize: dims halve, sampled sum and corner match the strided payload bytes") {
    val rows = Multimodal.m06ImageResize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(40).foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      val h = math.max(1, (bytes.length + 11) / 12)
      val outH = (h + 1) / 2
      assert(r.getInt(1) == 2 && r.getInt(2) == outH,
        s"dims doc ${r.getLong(0)}")
      def byteAt(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
      // dst(x,y) = src(2x,2y); bottom-up rows ⇒ dst row y reads payload
      // row (h-1-2y); src x∈{0,2} ⇒ byte offsets {0,1,2, 6,7,8}
      val want = (0 until outH).map { y =>
        Seq(0, 1, 2, 6, 7, 8).map(o => byteAt((h - 1 - 2 * y) * 12 + o).toLong).sum
      }.sum
      assert(r.getLong(3) == want, s"out_pixel_sum doc ${r.getLong(0)}")
      // resized bottom-left corner = payload row (1 if h even else 0),
      // bytes B,G,R
      val crow = if (h % 2 == 0) 1 else 0
      assert(r.getInt(4) == byteAt(crow * 12 + 2), s"corner_r doc ${r.getLong(0)}")
      assert(r.getInt(5) == byteAt(crow * 12 + 1), s"corner_g doc ${r.getLong(0)}")
      assert(r.getInt(6) == byteAt(crow * 12), s"corner_b doc ${r.getLong(0)}")
    }
  }
}
