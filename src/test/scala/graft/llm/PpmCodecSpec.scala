package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.mr.TestSession

/** The real-codec seam (m06): PPM parse/encode semantics and the
  * decoder's integration with the Multimodal batch plumbing.
  */
class PpmCodecSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def img(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => f(i).toByte)

  test("encode → decode round-trips dims, maxval, and every raster byte") {
    val raster = img(5, 4)(i => i * 11)
    val bytes = PpmCodec.encode(5, 4, 255, raster, Some("round trip"))
    val d = PpmCodec.decode(bytes)
    assert((d.width, d.height, d.maxval) == ((5, 4, 255)))
    assert(d.raster.toSeq == raster.toSeq)
  }

  test("header comments are skipped wherever token whitespace is legal") {
    val raster = img(2, 2)(identity)
    val bytes = ("P6\n#one\n# two\n2 #inline\n2\n#before maxval\n255\n")
      .getBytes("US-ASCII") ++ raster
    val d = PpmCodec.decode(bytes)
    assert((d.width, d.height) == ((2, 2)))
    assert(d.raster.toSeq == raster.toSeq)
  }

  test("raster bytes that LOOK like whitespace or '#' survive (one-separator rule)") {
    // first raster byte 0x0a ('\n'), second 0x23 ('#'): a parser that
    // greedily skips whitespace/comments after maxval corrupts these
    val raster = Array[Byte](0x0a, 0x23, 0x20, 1, 2, 3, 4, 5, 6, 7, 8, 9)
    val d = PpmCodec.decode(PpmCodec.encode(2, 2, 255, raster))
    assert(d.raster.toSeq == raster.toSeq)
  }

  test("maxval >= 256 switches to 2-byte big-endian samples") {
    // 1x1 RGB at maxval 65535: raster is 6 bytes, not 3
    val raster = Array[Byte](0x12, 0x34, 0x56, 0x78, (0x9a).toByte, (0xbc).toByte)
    val bytes = "P6\n1 1\n65535\n".getBytes("US-ASCII") ++ raster
    val d = PpmCodec.decode(bytes)
    assert((d.width, d.height, d.maxval, d.bytesPerSample) == ((1, 1, 65535, 2)))
    assert(d.raster.toSeq == raster.toSeq)
    // the same raster truncated by one byte must be rejected
    assertThrows[IllegalArgumentException](
      PpmCodec.decode("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ raster.dropRight(1)))
  }

  test("malformed inputs are rejected, not mis-decoded") {
    val ok = PpmCodec.encode(2, 2, 255, img(2, 2)(identity))
    assertThrows[IllegalArgumentException](PpmCodec.decode("P5\n2 2\n255\n".getBytes ++ img(2, 2)(identity)))
    assertThrows[IllegalArgumentException](PpmCodec.decode(ok.dropRight(1))) // truncated raster
    assertThrows[IllegalArgumentException](PpmCodec.decode("P6\n2 -2\n255\n".getBytes ++ img(2, 2)(identity)))
    assertThrows[IllegalArgumentException](PpmCodec.decode("P6\n2 2\n70000\n".getBytes ++ img(2, 2)(identity)))
  }

  test("PpmDecoder drives the existing extractFeatures seam with real parses") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Multimodal.ppmTable(spark, sf), () => new PpmDecoder)
      .select("doc_id", "width", "height", "channels")
      .as[(Long, Int, Int, Int)].collect()
    assert(feats.nonEmpty)
    feats.foreach { case (id, w, h, c) =>
      assert(w == PpmCodec.synthWidth(id) && h == PpmCodec.synthHeight(id) && c == 3)
    }
  }

  test("synth payloads are spec-valid P6 with the formula's raster") {
    val b = PpmCodec.synth(42L)
    val d = PpmCodec.decode(b)
    assert(d.width == PpmCodec.synthWidth(42L) && d.height == PpmCodec.synthHeight(42L))
    d.raster.zipWithIndex.foreach { case (px, i) =>
      assert((px & 0xff) == ((42L * 31 + i.toLong * 7) % 256).toInt)
    }
  }
}
