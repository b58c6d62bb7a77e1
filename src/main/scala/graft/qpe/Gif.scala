package graft.qpe

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.File

import javax.imageio.ImageIO

/** S13: GIF product sink — palette GIF with the AQC power-law DN scale
  * (reference: common/io_data.py:231-259 save_gif; 283-291 read_gif decode
  * `scale[2:251] = (10^((dn-71.5)/20)/316)^(2/3)`; palette roundtrip via the
  * green channel `dn = 255 - g`).
  *
  * Pure JDK (javax.imageio GIF codec + IndexColorModel) — no external image
  * library. Driver-side on the collected 1.8 MB grid, like the reference's
  * writer; the distributed encode path for DN columns is
  * [[graft.functions.Phys.searchSorted]] / [[graft.functions.Phys.dnDecode]].
  */
object Gif {

  /** DN → mm/h scale. DN 0/1 = no precipitation (0.0), DN 2..250 the power
    * law, DN 251..255 masked (NaN; 255 is the explicit mask the reference
    * writes for negative cells).
    */
  val Scale: Array[Double] = Array.tabulate(256) { i =>
    if (i < 2) 0.0
    else if (i <= 250) math.pow(math.pow(10.0, (i - 71.5) / 20.0) / 316.0, 2.0 / 3.0)
    else Double.NaN
  }

  /** mm/h → DN: NaN/negative → 255 (mask), 0 → 0, else the smallest DN in
    * 2..250 whose scale value reaches v (numpy searchsorted side='left'),
    * clamped at 250.
    */
  def encodeDn(v: Double): Int = {
    if (v.isNaN || v < 0) 255
    else if (v == 0.0) 0
    else if (v <= Scale(2)) 2
    else if (v > Scale(250)) 250
    else {
      var lo = 2; var hi = 250
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (Scale(m) < v) lo = m + 1 else hi = m
      }
      lo
    }
  }

  def decodeDn(dn: Int): Double = Scale(dn & 0xff)

  /** 256-entry palette with `green = 255 − dn`, so any palette-unaware RGB
    * reader recovers the DN exactly from the green channel — the contract
    * the reference's read_gif relies on (io_data.py:289 `255 - rgba[:,:,1]`).
    */
  def palette: IndexColorModel = {
    val r = Array.tabulate(256)(i => i.toByte)
    val g = Array.tabulate(256)(i => (255 - i).toByte)
    val b = Array.fill(256)(128.toByte)
    new IndexColorModel(8, 256, r, g, b)
  }

  /** Write a (row-major, grid(x)(y)) precipitation grid as a palette GIF. */
  def saveGif(path: String, grid: Array[Array[Double]]): Unit = {
    val nx = grid.length
    val ny = grid(0).length
    val img = new BufferedImage(ny, nx, BufferedImage.TYPE_BYTE_INDEXED, palette)
    val raster = img.getRaster
    var x = 0
    while (x < nx) {
      var y = 0
      while (y < ny) {
        raster.setSample(y, x, 0, encodeDn(grid(x)(y)))
        y += 1
      }
      x += 1
    }
    // write NON-interlaced explicitly: the JDK GIF writer's default
    // progressive mode interlaces rows, and interlaced small images come
    // back row-scrambled through ImageIO.read (observed on 4-row grids)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val ios = ImageIO.createImageOutputStream(new File(path))
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
  }

  /** Read a palette GIF back to mm/h through the green-channel power law. */
  def readGif(path: String): Array[Array[Double]] = {
    val img = ImageIO.read(new File(path))
    // ImageIO signals an undecodable payload with null, which would NPE on
    // the first dimension read — fail as a parse error like Hdf5.read does
    require(img != null, s"$path: not a decodable image")
    Array.tabulate(img.getHeight, img.getWidth) { (x, y) =>
      val g = (img.getRGB(y, x) >> 8) & 0xff
      decodeDn(255 - g)
    }
  }
}
