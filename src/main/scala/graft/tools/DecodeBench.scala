package graft.tools

/** Dev micro-bench for the image-decode histogram loop: per-pixel
  * `getSample` vs row-batched `getSamples` (the shape
  * `Multimodal.decodeImage` uses) on the same decoded raster, plus the
  * end-to-end decode. No Spark — the loop is per-image executor work.
  */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val w = 1024; val h = 1024
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    println(s"png: ${png.length} bytes, ${w}x$h x3")

    val raster = img.getRaster
    val channels = raster.getNumBands
    val shifts = Array.tabulate(channels)(c =>
      math.max(0, raster.getSampleModel.getSampleSize(c) - 3))

    def perPixel(): Array[Float] = {
      val hist = new Array[Float](channels * 8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < channels) {
            hist(c * 8 + math.min(7, raster.getSample(x, y, c) >> shifts(c))) += 1f
            c += 1
          }
          x += 1
        }
        y += 1
      }
      hist
    }
    def rowBatched(): Array[Float] = {
      val hist = new Array[Float](channels * 8)
      val rowBuf = new Array[Int](w)
      var c = 0
      while (c < channels) {
        val shift = shifts(c); val base = c * 8
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, c, rowBuf)
          var x = 0
          while (x < w) {
            hist(base + math.min(7, rowBuf(x) >> shift)) += 1f; x += 1
          }
          y += 1
        }
        c += 1
      }
      hist
    }

    require(perPixel().sameElements(rowBatched()), "histogram mismatch")
    def time(name: String, reps: Int)(f: => Any): Unit = {
      (1 to 3).foreach(_ => f) // JIT warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e6 / reps}%8.2f ms/image")
    }
    time("per-pixel getSample", 20)(perPixel())
    time("row getSamples", 20)(rowBatched())
    time("full decodeImage", 20)(
      graft.operators.Multimodal.decodeImage(png).get)
  }
}
