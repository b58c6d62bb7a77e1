package graft.qpe

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Interop paths of the HDF5 reader that our own writer never produces —
  * foreign files (libhdf5/h5py) do: non-float32 element types, the shuffle
  * filter, per-chunk filter masks (optional deflate skipped on a
  * high-entropy chunk), truncated streams, continuation blocks. Driven
  * partly through package-private element helpers, partly through byte
  * surgery on files our writer emits (turning them into the shapes libhdf5
  * writes).
  */
class Hdf5ForeignSpec extends AnyFunSuite {

  private def tmp(): String = Files.createTempFile("graft-h5f", ".h5").toString

  test("decodeElem: fixed-point and float element types, both endiannesses") {
    import Hdf5.{decodeElem, ElemType}
    // uint8: 200 must not sign-extend to -56
    assert(decodeElem(Array(200.toByte), 0, ElemType(0, 1, littleEndian = true, signed = false)) == 200.0f)
    assert(decodeElem(Array(200.toByte), 0, ElemType(0, 1, littleEndian = true, signed = true)) == -56.0f)
    // int16 BE: 0xFFFD = -3
    assert(decodeElem(Array(0xff.toByte, 0xfd.toByte), 0,
      ElemType(0, 2, littleEndian = false, signed = true)) == -3.0f)
    // uint16 LE: 40000 = 0x9C40 -> bytes 40 9C
    assert(decodeElem(Array(0x40.toByte, 0x9c.toByte), 0,
      ElemType(0, 2, littleEndian = true, signed = false)) == 40000.0f)
    // int32 LE: -123456
    val i32 = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(-123456).array()
    assert(decodeElem(i32, 0, ElemType(0, 4, littleEndian = true, signed = true)) == -123456.0f)
    // float32 BE
    val f32 = ByteBuffer.allocate(4).putFloat(2.5f).array()
    assert(decodeElem(f32, 0, ElemType(1, 4, littleEndian = false, signed = true)) == 2.5f)
    // float64 LE narrows to Float
    val f64 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(-0.125).array()
    assert(decodeElem(f64, 0, ElemType(1, 8, littleEndian = true, signed = true)) == -0.125f)
  }

  test("unshuffle inverts the HDF5 shuffle filter byte-plane layout") {
    // elements 0x0102, 0x0304, 0x0506 (2-byte), shuffled = plane of first
    // bytes then plane of second bytes
    val shuffledBytes = Array[Byte](0x02, 0x04, 0x06, 0x01, 0x03, 0x05)
    val out = Hdf5.unshuffle(shuffledBytes, 2)
    assert(out.toSeq == Seq[Byte](0x02, 0x01, 0x04, 0x03, 0x06, 0x05))
    // elemSize 1 is the identity
    assert(Hdf5.unshuffle(Array[Byte](1, 2, 3), 1).toSeq == Seq[Byte](1, 2, 3))
  }

  test("inflate throws on truncated deflate input instead of spinning") {
    val raw = Array.tabulate(4096)(i => (i % 251).toByte)
    val packed = Hdf5.deflate(raw)
    val e = intercept[IllegalArgumentException] {
      Hdf5.inflate(packed.take(packed.length / 2), raw.length)
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("per-chunk filter mask: a raw-stored chunk (optional deflate skipped) reads back") {
    import Hdf5.{Data, Group}
    // incompressible data so the raw chunk FITS the slot deflate allocated
    // (deflate expands high-entropy input by a few header bytes)
    val rnd = new scala.util.Random(3)
    val grid = Array.fill(8, 16)(java.lang.Float.intBitsToFloat(
      0x3f800000 | rnd.nextInt(0x7fffff))) // uniform mantissa noise in [1,2)
    val path = tmp()
    Hdf5.write(path, Group(children = Seq("data" -> Data(grid, Nil, chunkRows = 4))))
    val bytes = Files.readAllBytes(Paths.get(path))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // locate the chunk B-tree: the only "TREE" node with type 1
    val treeAt = (0 until bytes.length - 5).find(i =>
      bytes(i) == 'T' && bytes(i + 1) == 'R' && bytes(i + 2) == 'E' &&
      bytes(i + 3) == 'E' && bytes(i + 4) == 1).get
    // key0 at treeAt+24: nbytes(4) mask(4) offsets(24); child0 addr follows
    val key0 = treeAt + 24
    val child0 = b.getLong(key0 + 32)
    // surgery: store chunk 0 RAW (rows 0-3) at its address, set mask bit 0
    val raw = ByteBuffer.allocate(4 * 16 * 4).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(r => grid(r).foreach(raw.putFloat))
    assert(raw.array().length <= b.getInt(key0), "raw chunk must fit the deflated slot")
    b.position(child0.toInt); b.put(raw.array())
    b.putInt(key0, raw.array().length) // stored size = raw size
    b.putInt(key0 + 4, 1)              // mask bit 0: filter 0 (deflate) skipped
    Files.write(Paths.get(path), bytes)
    val back = Hdf5.read(path).children("data").data.get
    (0 until 8).foreach(r => (0 until 16).foreach(c =>
      assert(back(r)(c) == grid(r)(c), s"($r,$c)")))
  }

  test("object-header continuation block: messages beyond the first block are read") {
    import Hdf5.{Group, Lng}
    // root group with ONE attr: OH = prefix 16 + symtab msg 24 + attr msg 56
    val path = tmp()
    Hdf5.write(path, Group(attrs = Seq("a" -> Lng(77L))))
    val bytes = Files.readAllBytes(Paths.get(path))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val rootOh = b.getLong(64).toInt
    assert(b.getShort(rootOh + 2) == 2) // symtab + attr
    val attrMsg = rootOh + 16 + 24
    assert(b.getShort(attrMsg) == 0x000C)
    val attrSize = b.getShort(attrMsg + 2).toInt // 48 data bytes
    // surgery: move the attr message to EOF, replace it in-block with a
    // CONTINUATION message spanning the same bytes (libhdf5's layout for
    // groups whose attributes outgrow the first header block)
    val moved = bytes.slice(attrMsg, attrMsg + 8 + attrSize)
    val out = ByteBuffer.allocate(bytes.length + moved.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(bytes)
    val contAt = bytes.length.toLong
    out.put(moved)
    out.putShort(rootOh + 2, 3.toShort)        // symtab + continuation + attr
    out.putShort(attrMsg, 0x0010.toShort)      // continuation message
    out.putShort(attrMsg + 2, attrSize.toShort) // same span: block stays aligned
    out.putLong(attrMsg + 8, contAt)
    out.putLong(attrMsg + 16, moved.length.toLong)
    Files.write(Paths.get(path), out.array())
    val back = Hdf5.read(path)
    assert(back.attrs("a") == Lng(77L))
  }
}
