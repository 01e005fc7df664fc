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

    // r22 second experiment: per-call ImageIO.read (reader lookup +
    // stream per image) vs ONE reusable PNG ImageReader per batch —
    // the §4.5 "heavyweight state once per task" lever at the decode
    // seam — and the same for the PNG encode side.
    def readReusable(): Long = {
      val t0 = System.nanoTime()
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      var acc = 0L
      blobs.foreach { b =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b))
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        acc += img.getWidth * img.getHeight
        iis.close()
      }
      reader.dispose()
      val dt = (System.nanoTime() - t0) / 1000000
      println(s"[decode] reusable-reader ${dt} ms (acc=$acc)")
      dt
    }
    def readPerCall(): Long = {
      val t0 = System.nanoTime()
      var acc = 0L
      blobs.foreach { b =>
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(b)))
        acc += img.getWidth * img.getHeight
      }
      val dt = (System.nanoTime() - t0) / 1000000
      println(s"[decode] per-call-read   ${dt} ms (acc=$acc)")
      dt
    }
    def encodeReusable(): Long = {
      val t0 = System.nanoTime()
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      var acc = 0L
      (0 until n).foreach { id =>
        val w = (16 + id % 16); val h = (16 + (id / 16) % 16)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) { raster.setSample(i % w, i / w, 0, (id * 31 + i) % 256); i += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(img)
        ios.close()
        acc += bos.size()
      }
      writer.dispose()
      val dt = (System.nanoTime() - t0) / 1000000
      println(s"[decode] reusable-writer ${dt} ms (acc=$acc)")
      dt
    }
    def encodePerCall(): Long = {
      val t0 = System.nanoTime()
      var acc = 0L
      (0 until n).foreach { id =>
        val w = (16 + id % 16); val h = (16 + (id / 16) % 16)
        acc += Multimodal.encodePng(w, h, i => ((id * 31 + i) % 256)).length
      }
      val dt = (System.nanoTime() - t0) / 1000000
      println(s"[decode] per-call-write  ${dt} ms (acc=$acc)")
      dt
    }
    // byte-equality witness for the reusable writer
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val eqW = (0 until 200).forall { id =>
      val w = (16 + id % 16); val h = (16 + (id / 16) % 16)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < w * h) { raster.setSample(i % w, i / w, 0, (id * 31 + i) % 256); i += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      wtr.setOutput(ios); wtr.write(img); ios.close()
      java.util.Arrays.equals(bos.toByteArray,
        Multimodal.encodePng(w, h, i => ((id * 31 + i) % 256)))
    }
    wtr.dispose()
    println(s"[decode] reusable-writer bytes equal on 200 samples: $eqW")
    (1 to 3).foreach { _ =>
      readPerCall(); readReusable(); encodePerCall(); encodeReusable()
    }
  }
}
