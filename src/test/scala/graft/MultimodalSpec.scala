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
}
