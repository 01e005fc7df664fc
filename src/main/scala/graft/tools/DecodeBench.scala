package graft.tools

import graft.pipeline.Multimodal

/** Interleaved single-JVM micro A/B of the ImageIO decode inner loop
  * (r22): per-pixel getSample vs bulk per-band getSamples, on the
  * exact synthetic PNG population the image chain decodes.
  */
object DecodeBench {

  private def decodeOld(blob: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(blob)))
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val bands = raster.getNumBands
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0; var b = 0
        while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
        out(y * w + x) = (s / bands).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val n = 5000
    val blobs = (0 until n).map { id =>
      val w = (16 + id % 16); val h = (16 + (id / 16) % 16)
      Multimodal.encodePng(w, h, i => ((id * 31 + i) % 256))
    }.toArray
    def timeIt(name: String)(f: Array[Byte] => Array[Byte]): Long = {
      val t0 = System.nanoTime()
      var acc = 0L
      blobs.foreach { b => acc += f(b).length }
      val dt = (System.nanoTime() - t0) / 1000000
      println(s"[decode] $name ${dt} ms (acc=$acc)")
      dt
    }
    def neu(b: Array[Byte]): Array[Byte] =
      Multimodal.ImageIODecoder.decode("image", b).payload
    // equality witness
    val same = blobs.take(200).forall(b =>
      java.util.Arrays.equals(decodeOld(b), neu(b)))
    println(s"[decode] outputs equal on 200 samples: $same")
    (1 to 3).foreach { r =>
      timeIt(s"old(per-pixel) rep$r")(decodeOld)
      timeIt(s"new(bulk-band) rep$r")(neu)
    }
  }
}
