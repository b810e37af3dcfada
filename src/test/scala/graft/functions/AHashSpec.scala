package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.multimodal.MediaDecoder

final class AHashSpec extends SparkTestBase {
  import spark.implicits._

  private def hashOf(payloads: Seq[Array[Byte]]): Seq[Option[Long]] =
    payloads.map(Tuple1(_)).toDF("payload")
      .select(AHash64($"payload").as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq

  test("known tile: ramp 0..63 has mean 31.5, so exactly the top half's bits set") {
    val ramp = Array.tabulate[Byte](64)(_.toByte)
    // pixels 32..63 > 31.5 → bits (63-32)..(63-63) → low 32 bits
    assert(hashOf(Seq(ramp)) == Seq(Some(0x00000000FFFFFFFFL)))
  }

  test("global brightness shift leaves the hash unchanged; solid tile hashes to 0") {
    val ramp    = Array.tabulate[Byte](64)(_.toByte)
    val brighter = ramp.map(b => (b + 100).toByte)
    val solid   = Array.fill[Byte](64)(77)
    val Seq(h1, h2, h3) = hashOf(Seq(ramp, brighter, solid))
    assert(h1 == h2)        // p > mean ⇔ p+c > mean+c
    assert(h3 == Some(0L))  // nothing is strictly brighter than the mean
  }

  test("payloads shorter than the tile yield NULL, not a padded hash") {
    assert(hashOf(Seq(Array.fill[Byte](63)(1))) == Seq(None))
  }

  test("real PNG path: decode -> grayscaleTile -> aHash is stable and discriminative") {
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, f(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val gradient = png((x, _) => { val v = x * 8; (v << 16) | (v << 8) | v })
    val vertical = png((_, y) => { val v = y * 8; (v << 16) | (v << 8) | v })
    def ah(p: Array[Byte]): Long = {
      val tile = MediaDecoder.grayscaleTile(p, 8, 8).get
      hashOf(Seq(tile)).head.get
    }
    assert(ah(gradient) == ah(gradient)) // deterministic decode + hash
    val hamming = java.lang.Long.bitCount(ah(gradient) ^ ah(vertical))
    assert(hamming >= 16, s"orthogonal gradients too close: $hamming")
  }
}
