package graft.llm

/** A real media codec behind the [[Multimodal.MediaDecoder]] seam: binary
  * PPM (Netpbm `P6`), the uncompressed RGB interchange format — parseable
  * spec-correctly in pure JVM code, no external codec library, which is
  * exactly what this container allows. With this, the m-family's decode
  * path stops being plumbing-only: m06 generates REAL P6 byte streams
  * (header + comment + raster), parses them back through this decoder,
  * and gates the decoded dimensions and per-channel pixel sums against an
  * oracle that re-derives them from the generative formula — so the
  * header writer, the tokenizer (whitespace + `#` comments + the
  * single-whitespace-after-maxval rule), and the raster indexing are all
  * behavior-gated.
  *
  * Spec implemented (the published Netpbm format definition):
  *   - magic `P6`, then width, height, maxval as ASCII decimal tokens;
  *   - tokens separated by whitespace; `#` starts a comment running to
  *     end-of-line, allowed anywhere token whitespace is;
  *   - EXACTLY ONE whitespace byte after maxval (a raster byte may look
  *     like whitespace — consuming a run there corrupts the image);
  *   - raster: height rows of width pixels, 3 samples each, 1 byte per
  *     sample when maxval < 256, 2 (big-endian) otherwise.
  */
object PpmCodec {

  final case class PpmImage(width: Int, height: Int, maxval: Int, raster: Array[Byte]) {
    def bytesPerSample: Int = if (maxval < 256) 1 else 2
  }

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0x0b || c == '\f'

  /** Parse a P6 payload. Throws IllegalArgumentException on malformed
    * input (wrong magic, non-numeric header, out-of-range maxval,
    * truncated raster) — a production pipeline catches per-row and
    * counts, the reference's skip-bad-and-count posture
    * (reference mrproto/protocol.go:32-35).
    */
  def decode(b: Array[Byte]): PpmImage = {
    var pos = 0
    def peek: Int = b(pos) & 0xff
    def skipWsAndComments(): Unit = {
      var moving = true
      while (moving && pos < b.length) {
        if (isWs(peek)) pos += 1
        else if (peek == '#') { while (pos < b.length && peek != '\n') pos += 1 }
        else moving = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < b.length && !isWs(peek) && peek != '#') pos += 1
      require(pos > start, s"ppm: missing header token at byte $start")
      new String(b, start, pos - start, "US-ASCII")
    }
    def intToken(what: String): Int = {
      val t = token()
      require(t.forall(_.isDigit), s"ppm: non-numeric $what '$t'")
      t.toInt
    }
    require(token() == "P6", "ppm: not a binary P6 file")
    val w = intToken("width")
    val h = intToken("height")
    val mv = intToken("maxval")
    require(w > 0 && h > 0, s"ppm: bad dimensions ${w}x$h")
    require(mv > 0 && mv < 65536, s"ppm: maxval $mv out of range")
    // exactly one whitespace byte, then raw raster — no comment skipping
    // here: raster bytes may BE '#' or whitespace values
    require(pos < b.length && isWs(peek), "ppm: missing raster separator")
    pos += 1
    val n = w * h * 3 * (if (mv < 256) 1 else 2)
    require(b.length - pos >= n,
      s"ppm: truncated raster (${b.length - pos} of $n bytes)")
    PpmImage(w, h, mv, java.util.Arrays.copyOfRange(b, pos, pos + n))
  }

  /** Encode a P6 payload (maxval < 256 form), optional header comment. */
  def encode(width: Int, height: Int, maxval: Int, raster: Array[Byte],
      comment: Option[String] = None): Array[Byte] = {
    require(maxval > 0 && maxval < 256, "encoder ships the 1-byte/sample form")
    require(raster.length == width * height * 3, "raster size mismatch")
    require(comment.forall(c => !c.contains('\n')), "comment must be one line")
    val header = new StringBuilder("P6\n")
    comment.foreach(c => header ++= s"#$c\n")
    header ++= s"$width $height\n$maxval\n"
    val hb = header.toString.getBytes("US-ASCII")
    val out = new Array[Byte](hb.length + raster.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(raster, 0, out, hb.length, raster.length)
    out
  }

  // ------------------------------------------------- synthetic generator

  /** Deterministic synthetic image for doc `id` — the testdata has no
    * real media column, so m06 manufactures one, the same move as t13's
    * planted PII and t19's planted language markers. The FORMULA is the
    * shared spec the oracle replays; the BYTES only exist Spark-side and
    * must survive a real encode→decode round trip to gate green.
    *
    * width = 4 + id mod 13, height = 3 + id mod 7, maxval = 255,
    * raster byte i = (id·31 + i·7) mod 256.
    */
  def synthWidth(id: Long): Int = (4 + id % 13).toInt
  def synthHeight(id: Long): Int = (3 + id % 7).toInt

  def synth(id: Long): Array[Byte] = {
    val w = synthWidth(id)
    val h = synthHeight(id)
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    while (i < raster.length) {
      raster(i) = ((id * 31 + i.toLong * 7) % 256).toByte
      i += 1
    }
    encode(w, h, 255, raster, Some(s"synthetic ppm $id"))
  }
}

/** Dimension decoder over [[PpmCodec]] — drops into the existing
  * [[Multimodal.extractFeatures]]/[[Multimodal.resizeTo]] seam in place
  * of the stub, with the same per-partition handle lifecycle.
  */
class PpmDecoder extends Multimodal.MediaDecoder {
  def decode(payload: Array[Byte]): (Int, Int, Int) = {
    val img = PpmCodec.decode(payload)
    (img.width, img.height, 3)
  }
}
