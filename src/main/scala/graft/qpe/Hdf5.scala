package graft.qpe

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal pure-JVM HDF5 serialization — enough of the classic (v0
  * superblock) format for ODIM product files: a group hierarchy with
  * scalar string/double/int64 attributes and float32 2-D datasets, either
  * contiguous or chunked + deflate (the libhdf5-default product shape).
  * No external library: the JVM has no HDF5 codec and the dependency set
  * is fixed, so the container is emitted directly from the published HDF5
  * File Format Specification (v1 object headers, symbol-table groups with
  * v1 B-tree + local heap + SNOD, v1 attribute messages, v3 layouts,
  * filter pipeline). Files written here open with any HDF5 1.x reader
  * (h5py/libhdf5/nczarr) — the structures used are the
  * lowest-compatibility classic ones libhdf5 itself writes by default.
  *
  * The reader goes further than the writer for interop with files OTHER
  * producers write (the reference reads foreign ODIM grids,
  * io_data.py:189): chunk B-trees at any level with per-chunk filter
  * masks, deflate + shuffle filters, fixed-point and float element types
  * of 1-8 bytes in either endianness, and object-header continuation
  * blocks. It follows addresses from the superblock, never assumes this
  * writer's block order. Driver-side on collected grids like the
  * reference's writer (qpe/qpe.py:302-308).
  */
object Hdf5 {

  // ---- public model -------------------------------------------------------

  sealed trait Attr
  final case class Str(v: String) extends Attr
  final case class Dbl(v: Double) extends Attr
  final case class Lng(v: Long) extends Attr

  sealed trait Node
  /** Group with attributes and named children (groups or datasets). */
  final case class Group(attrs: Seq[(String, Attr)] = Nil,
                         children: Seq[(String, Node)] = Nil) extends Node
  /** Float32 dataset, `grid(row)(col)`. `chunkRows = 0` writes contiguous;
    * `chunkRows > 0` writes row-band chunks, each deflate-compressed — the
    * libhdf5-default shape real ODIM products ship with (chunked + gzip),
    * and typically ~10x smaller for radar grids full of repeated nodata.
    */
  final case class Data(grid: Array[Array[Float]],
                        attrs: Seq[(String, Attr)] = Nil,
                        chunkRows: Int = 0) extends Node

  /** Parse result: the same shape, data re-materialized. */
  final case class Parsed(attrs: Map[String, Attr],
                          children: Map[String, Parsed],
                          data: Option[Array[Array[Float]]])

  // ---- format constants ---------------------------------------------------

  private val Signature = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val Undef = -1L // 0xFFFF…FF = "undefined address"
  private val LeafK = 4   // group leaf node K (superblock bytes 16-17)
  private val BtreeSize = 24 + (2 * LeafK + 1) * 8 + 2 * LeafK * 8 // header + keys + children
  private val SnodSize = 8 + 2 * LeafK * 40                        // header + entries

  private def pad8(n: Int): Int = (n + 7) & ~7

  /** All name/value strings are UTF-8 (HDF5 charset 1) and every size field
    * derives from ENCODED byte length — sizing from String.length would
    * diverge on non-ASCII text and corrupt the fixed-offset layout.
    */
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def nulTerm(s: String): Array[Byte] = utf8(s) :+ 0.toByte

  // ---- size computation (addresses are fixed-width, so sizes are static) --

  /** v1 header message: 8-byte header + data padded to 8 (the size FIELD
    * includes the padding, per the v1 spec).
    */
  private def msgSize(dataLen: Int): Int = 8 + pad8(dataLen)

  private def dtLen(a: Attr): Int = a match {
    case Str(v) => 8       // class 3 string, no property fields
    case _: Dbl => 8 + 12  // class 1 float, 12 property bytes
    case _: Lng => 8 + 4   // class 0 fixed-point, 4 property bytes
  }

  private def dataLen(a: Attr): Int = a match {
    case Str(v) => utf8(v).length + 1 // NUL-terminated
    case _ => 8
  }

  /** v1 attribute message data: fixed 8 + padded name/datatype/dataspace +
    * raw value (the value itself is not padded).
    */
  private def attrDataLen(name: String, a: Attr): Int =
    8 + pad8(utf8(name).length + 1) + pad8(dtLen(a)) + pad8(8) + dataLen(a)

  private def groupOhSize(g: Group): Int =
    16 + msgSize(16) + g.attrs.map { case (n, a) => msgSize(attrDataLen(n, a)) }.sum

  private def datasetOhSize(d: Data): Int =
    16 + msgSize(8 + 16) /* dataspace: 2 dims */ +
      msgSize(20) /* float32 datatype */ +
      msgSize(4) /* fill value v2, undefined */ +
      (if (d.chunkRows > 0)
         msgSize(8 + 16) /* filter pipeline: one deflate entry */ +
           msgSize(23)   /* layout v3 chunked: 3 dims + btree addr */
       else
         msgSize(18) /* layout v3 contiguous */) +
      d.attrs.map { case (n, a) => msgSize(attrDataLen(n, a)) }.sum

  /** v1 chunk B-tree (node type 1): 24-byte header + n children (8 each) +
    * n+1 keys of (size 4 + mask 4 + 3×8 offsets = 32 bytes).
    */
  private def chunkBtreeSize(nChunks: Int): Int = 24 + (nChunks + 1) * 32 + nChunks * 8

  private[qpe] def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 4 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Local heap: 32-byte header + data (8-byte null entry at offset 0 so
    * link-name-offset 0 is the empty string, then NUL-terminated names
    * padded to 8).
    */
  private def heapSizes(names: Seq[String]): (Int, Map[String, Long]) = {
    var off = 8L
    val offsets = names.map { n =>
      val o = n -> off
      off += pad8(utf8(n).length + 1)
      o
    }.toMap
    (32 + off.toInt, offsets)
  }

  // ---- layout plan --------------------------------------------------------

  private sealed trait Plan { def addrOh: Long }
  private final case class GPlan(g: Group, addrOh: Long, addrHeap: Long,
                                 addrBtree: Long, addrSnod: Long,
                                 heapDataSize: Int, nameOff: Map[String, Long],
                                 kids: Seq[(String, Plan)]) extends Plan
  /** Contiguous: `addrData` set, `chunks` empty. Chunked: per-chunk
    * (address, deflated bytes, row offset) + the chunk B-tree address and
    * the EFFECTIVE chunk row count (caller's chunkRows clamped to the grid
    * — libhdf5 rejects chunk dims larger than a fixed dataspace, so a file
    * advertising one would undercut the interop claim).
    */
  private final case class DPlan(d: Data, addrOh: Long, addrData: Long,
                                 chunks: Seq[(Long, Array[Byte], Int)],
                                 addrBtree: Long, chunkRows: Int) extends Plan

  private final class Alloc(var at: Long) {
    def take(n: Int): Long = {
      // single growable-buffer writer: every block must land below the
      // ByteBuffer cap, INCLUDING deflate-expanded chunks and edge-chunk
      // padding — guarding only the raw dataset bytes is not enough
      require(at + n <= Int.MaxValue,
        s"allocation of $n bytes at $at exceeds the 2 GiB single-buffer cap")
      val a = at; at += n; a
    }
  }

  private def layout(node: Node, alloc: Alloc): Plan = node match {
    case d: Data =>
      val oh = alloc.take(datasetOhSize(d))
      val rows = d.grid.length
      val cols = if (rows == 0) 0 else d.grid(0).length
      // guard the Int byte math explicitly — a grid past ~500M cells would
      // otherwise overflow the allocator silently (ODIM grids are ~1.8 MB)
      val dataBytes = rows.toLong * cols * 4
      require(dataBytes <= Int.MaxValue - alloc.at,
        s"dataset of $rows x $cols floats exceeds the 2 GiB single-buffer cap")
      if (d.chunkRows <= 0) DPlan(d, oh, alloc.take(dataBytes.toInt), Nil, Undef, 0)
      else {
        val cr = math.min(d.chunkRows, math.max(rows, 1))
        val chunkBytes = cr.toLong * cols * 4
        require(chunkBytes <= Int.MaxValue,
          s"chunk of $cr x $cols floats exceeds the 2 GiB single-buffer cap")
        // row-band chunks, deflated at layout time so addresses are final
        val chunks = (0 until rows by cr).map { r0 =>
          val h = math.min(cr, rows - r0)
          val raw = ByteBuffer.allocate(chunkBytes.toInt)
            .order(ByteOrder.LITTLE_ENDIAN)
          (r0 until r0 + h).foreach(r => d.grid(r).foreach(raw.putFloat))
          // edge chunk: HDF5 stores FULL chunks; the tail rows beyond the
          // dataset are fill bytes the reader clips
          val packed = deflate(raw.array())
          (alloc.take(packed.length), packed, r0)
        }
        // the B-tree entries-used field is 2 bytes — refuse what it can't hold
        require(chunks.length <= 0xffff,
          s"${chunks.length} chunks exceed the 16-bit B-tree entry count; raise chunkRows")
        DPlan(d, oh, Undef, chunks, alloc.take(chunkBtreeSize(chunks.length)), cr)
      }
    case g: Group =>
      require(g.children.length <= 2 * LeafK,
        s"one-SNOD subset: at most ${2 * LeafK} children per group " +
          s"(got ${g.children.length}) — ODIM trees stay well under this")
      val oh = alloc.take(groupOhSize(g))
      // symbol-table entries must be name-ordered (B-tree invariant)
      val sorted = g.children.sortBy(_._1)
      val kids = sorted.map { case (n, c) => n -> layout(c, alloc) }
      val (heapSize, nameOff) = heapSizes(sorted.map(_._1))
      val heap = alloc.take(heapSize)
      val btree = alloc.take(BtreeSize)
      val snod = alloc.take(SnodSize)
      GPlan(g, oh, heap, btree, snod, heapSize - 32, nameOff, kids)
  }

  // ---- rendering ----------------------------------------------------------

  private def putMsgHeader(b: ByteBuffer, tpe: Int, dataLen: Int): Unit = {
    b.putShort(tpe.toShort)
    b.putShort(pad8(dataLen).toShort)
    b.put(0.toByte) // flags
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
  }

  private def putPadded(b: ByteBuffer, bytes: Array[Byte]): Unit = {
    b.put(bytes)
    (bytes.length until pad8(bytes.length)).foreach(_ => b.put(0.toByte))
  }

  private def datatypeBytes(a: Attr): Array[Byte] = {
    val b = ByteBuffer.allocate(dtLen(a)).order(ByteOrder.LITTLE_ENDIAN)
    a match {
      case Str(v) =>
        b.put(0x13.toByte)      // version 1, class 3 (string)
        b.put(0x10.toByte)      // padding: NUL-terminated; charset: UTF-8
        b.put(0.toByte); b.put(0.toByte)
        b.putInt(utf8(v).length + 1) // element BYTE size incl. terminator
      case _: Dbl =>
        b.put(0x11.toByte)      // version 1, class 1 (float)
        b.put(0x20.toByte)      // LE, implied-mantissa normalization
        b.put(63.toByte)        // sign bit location
        b.put(0.toByte)
        b.putInt(8)
        b.putShort(0); b.putShort(64)          // bit offset / precision
        b.put(52.toByte); b.put(11.toByte)     // exponent location / size
        b.put(0.toByte); b.put(52.toByte)      // mantissa location / size
        b.putInt(1023)                         // exponent bias
      case _: Lng =>
        b.put(0x10.toByte)      // version 1, class 0 (fixed-point)
        b.put(0x08.toByte)      // LE, signed
        b.put(0.toByte); b.put(0.toByte)
        b.putInt(8)
        b.putShort(0); b.putShort(64)          // bit offset / precision
    }
    b.array()
  }

  private val Float32Datatype: Array[Byte] = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte); b.put(0x20.toByte); b.put(31.toByte); b.put(0.toByte)
    b.putInt(4)
    b.putShort(0); b.putShort(32)
    b.put(23.toByte); b.put(8.toByte)
    b.put(0.toByte); b.put(23.toByte)
    b.putInt(127)
    b.array()
  }

  private val ScalarDataspace: Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte)  // version
    b.put(0.toByte)  // dimensionality 0 = scalar
    b.put(0.toByte)  // flags: no max dims
    b.array()        // + 5 reserved zero bytes
  }

  private def attrValueBytes(a: Attr): Array[Byte] = a match {
    case Str(v) => nulTerm(v)
    case Dbl(v) =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    case Lng(v) =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
  }

  private def putAttrMsg(b: ByteBuffer, name: String, a: Attr): Unit = {
    val len = attrDataLen(name, a)
    putMsgHeader(b, 0x000C, len)
    val start = b.position()
    b.put(1.toByte); b.put(0.toByte)              // version 1, reserved
    b.putShort((utf8(name).length + 1).toShort)    // name BYTE size (with NUL)
    b.putShort(dtLen(a).toShort)                   // datatype size (unpadded)
    b.putShort(8.toShort)                          // dataspace size (unpadded)
    putPadded(b, nulTerm(name))
    putPadded(b, datatypeBytes(a))
    putPadded(b, ScalarDataspace)
    b.put(attrValueBytes(a))
    (len until pad8(len)).foreach(_ => b.put(0.toByte)) // message padding
    require(b.position() - start == pad8(len), s"attr '$name' mis-sized")
  }

  private def putOhPrefix(b: ByteBuffer, nMsgs: Int, msgBytes: Int): Unit = {
    b.put(1.toByte); b.put(0.toByte)  // version 1, reserved
    b.putShort(nMsgs.toShort)
    b.putInt(1)                       // reference count
    b.putInt(msgBytes)                // message-block size
    b.putInt(0)                       // 4-byte gap: messages align to 8
  }

  private def render(plan: Plan, b: ByteBuffer): Unit = plan match {
    case DPlan(d, addrOh, addrData, chunks, addrBtree, cr) =>
      val rows = d.grid.length
      val cols = if (rows == 0) 0 else d.grid(0).length
      val chunked = cr > 0
      b.position(addrOh.toInt)
      val nMsgs = (if (chunked) 5 else 4) + d.attrs.length
      putOhPrefix(b, nMsgs, datasetOhSize(d) - 16)
      // dataspace: v1, 2 dims
      putMsgHeader(b, 0x0001, 8 + 16)
      b.put(1.toByte); b.put(2.toByte); b.put(0.toByte)
      (0 until 5).foreach(_ => b.put(0.toByte))
      b.putLong(rows.toLong); b.putLong(cols.toLong)
      // datatype: float32 LE
      putMsgHeader(b, 0x0003, 20)
      putPadded(b, Float32Datatype)
      // fill value v2: unallocated/undefined
      putMsgHeader(b, 0x0005, 4)
      b.put(2.toByte)  // version
      b.put(1.toByte)  // space allocation: early
      b.put(0.toByte)  // fill write time: on allocation
      b.put(0.toByte)  // fill value undefined
      (4 until 8).foreach(_ => b.put(0.toByte))
      if (!chunked) {
        // layout v3, contiguous
        putMsgHeader(b, 0x0008, 18)
        b.put(3.toByte); b.put(1.toByte)
        b.putLong(addrData)
        b.putLong(rows.toLong * cols * 4)
        (18 until pad8(18)).foreach(_ => b.put(0.toByte))
      } else {
        // filter pipeline v1: one deflate entry (id 1, no name, level 6)
        putMsgHeader(b, 0x000B, 8 + 16)
        b.put(1.toByte); b.put(1.toByte)              // version, nfilters
        (0 until 6).foreach(_ => b.put(0.toByte))
        b.putShort(1.toShort)                          // filter id: deflate
        b.putShort(0.toShort)                          // no name
        b.putShort(0.toShort)                          // flags: mandatory
        b.putShort(1.toShort)                          // one client value
        b.putInt(6)                                    // level
        b.putInt(0)                                    // pad to even count
        // layout v3, chunked: dimensionality+1 dims, last = element size
        putMsgHeader(b, 0x0008, 23)
        b.put(3.toByte); b.put(2.toByte)
        b.put(3.toByte)                                // 2 data dims + elem dim
        b.putLong(addrBtree)
        b.putInt(cr); b.putInt(cols); b.putInt(4)
        (23 until pad8(23)).foreach(_ => b.put(0.toByte))
      }
      d.attrs.foreach { case (n, a) => putAttrMsg(b, n, a) }
      if (!chunked) {
        // raw data, row-major, LE float32
        b.position(addrData.toInt)
        d.grid.foreach(_.foreach(b.putFloat))
      } else {
        chunks.foreach { case (addr, bytes, _) =>
          b.position(addr.toInt); b.put(bytes)
        }
        // chunk B-tree: single level-0 node, entries in row-offset order;
        // each key = (stored nbytes, filter mask 0, offsets row/col/elem)
        b.position(addrBtree.toInt)
        b.put("TREE".getBytes("US-ASCII"))
        b.put(1.toByte)  // node type: raw data chunks
        b.put(0.toByte)  // leaf
        b.putShort(chunks.length.toShort)
        b.putLong(Undef); b.putLong(Undef)
        chunks.foreach { case (addr, bytes, r0) =>
          b.putInt(bytes.length); b.putInt(0)
          b.putLong(r0.toLong); b.putLong(0L); b.putLong(0L)
          b.putLong(addr)
        }
        // final key: the coordinates just past the last chunk
        b.putInt(0); b.putInt(0)
        b.putLong(chunks.length.toLong * cr); b.putLong(cols.toLong)
        b.putLong(4L)
      }

    case GPlan(g, addrOh, addrHeap, addrBtree, addrSnod, heapData, nameOff, kids) =>
      b.position(addrOh.toInt)
      putOhPrefix(b, 1 + g.attrs.length, groupOhSize(g) - 16)
      putMsgHeader(b, 0x0011, 16) // symbol table message
      b.putLong(addrBtree)
      b.putLong(addrHeap)
      g.attrs.foreach { case (n, a) => putAttrMsg(b, n, a) }
      // local heap
      b.position(addrHeap.toInt)
      b.put("HEAP".getBytes("US-ASCII"))
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
      b.putLong(heapData.toLong)
      b.putLong(Undef) // no free list
      b.putLong(addrHeap + 32)
      b.putLong(0L)    // null entry: heap offset 0 = empty string
      kids.foreach { case (n, _) =>
        b.position((addrHeap + 32 + nameOff(n)).toInt)
        putPadded(b, nulTerm(n))
      }
      // B-tree v1: one leaf pointing at the single SNOD (zero entries for
      // an empty group — libhdf5's shape for a group with no links)
      b.position(addrBtree.toInt)
      b.put("TREE".getBytes("US-ASCII"))
      b.put(0.toByte)  // node type: group
      b.put(0.toByte)  // leaf level
      b.putShort((if (kids.isEmpty) 0 else 1).toShort)
      b.putLong(Undef); b.putLong(Undef)
      if (kids.nonEmpty) {
        b.putLong(0L)    // key[0]: empty string (≤ every name)
        b.putLong(addrSnod)
        b.putLong(nameOff(kids.last._1)) // key[1]: last (greatest) name
      }
      // SNOD with one entry per child, name-ordered
      b.position(addrSnod.toInt)
      b.put("SNOD".getBytes("US-ASCII"))
      b.put(1.toByte); b.put(0.toByte)
      b.putShort(kids.length.toShort)
      kids.foreach { case (n, p) =>
        b.putLong(nameOff(n))
        b.putLong(p.addrOh)
        b.putInt(0)  // cache type: none
        b.putInt(0)
        b.putLong(0L); b.putLong(0L)
      }
      kids.foreach { case (_, p) => render(p, b) }
  }

  /** Write `root` as a classic HDF5 file. */
  def write(path: String, root: Group): Unit = {
    val alloc = new Alloc(96) // superblock v0 with 8-byte offsets
    val plan = layout(root, alloc).asInstanceOf[GPlan]
    val total = alloc.at
    val b = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    b.put(Signature)
    b.put(0.toByte)  // superblock version
    b.put(0.toByte)  // free-space version
    b.put(0.toByte)  // root symbol-table version
    b.put(0.toByte)
    b.put(0.toByte)  // shared-header-message version
    b.put(8.toByte)  // size of offsets
    b.put(8.toByte)  // size of lengths
    b.put(0.toByte)
    b.putShort(LeafK.toShort)
    b.putShort(16.toShort) // internal node K
    b.putInt(0)            // consistency flags
    b.putLong(0L)          // base address
    b.putLong(Undef)       // free-space info
    b.putLong(total)       // end-of-file address
    b.putLong(Undef)       // driver info
    // root symbol-table entry (cached: scratch = btree + heap)
    b.putLong(0L)          // link name offset
    b.putLong(plan.addrOh)
    b.putInt(1)            // cache type 1: group metadata cached
    b.putInt(0)
    b.putLong(plan.addrBtree)
    b.putLong(plan.addrHeap)
    render(plan, b)
    Files.write(Paths.get(path), b.array())
  }

  // ---- structural reader --------------------------------------------------

  /** Parse a file this subset writes (and any classic file restricted to
    * symbol-table groups + contiguous float32 data + scalar attributes).
    * Follows addresses from the superblock; never assumes block order.
    */
  def read(path: String): Parsed = {
    // the reader addresses the mapped file through Int buffer positions, so
    // every followed address (object headers, heaps, B-trees, chunks) is
    // exact iff the whole file fits in an Int — guard ONCE here, loudly,
    // instead of failing with an obscure buffer-position exception deep in
    // a parse (the writer has the same explicit 2 GiB cap)
    val fileSize = Files.size(Paths.get(path))
    require(fileSize < Int.MaxValue,
      s"HDF5 files >= 2 GiB unsupported by this reader ($fileSize bytes)")
    val bytes = Files.readAllBytes(Paths.get(path))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require((0 until 8).forall(i => bytes(i) == Signature(i)), "not an HDF5 file")
    require(bytes(8) == 0, s"superblock version ${bytes(8)} unsupported")
    require(bytes(13) == 8 && bytes(14) == 8, "only 8-byte offsets/lengths")
    b.position(56 + 8)
    val rootOh = b.getLong
    readObject(b, rootOh)
  }

  /** Dataset element type: class 0 (fixed-point) or 1 (float), 1-8 bytes,
    * either endianness — real ODIM producers write uint8/uint16 DN grids or
    * float32/float64, all of which decode to Float here.
    */
  private[qpe] final case class ElemType(cls: Int, size: Int, littleEndian: Boolean,
                                    signed: Boolean)

  private final case class ChunkedLayout(btree: Long, chunkRows: Int, chunkCols: Int)

  private def readObject(b: ByteBuffer, addr: Long, depth: Int = 0): Parsed = {
    // a corrupt/crafted file can link an object back to an ancestor; without
    // a depth bound that cycle recurses forever (real trees here are ~3 deep)
    require(depth < 64, "object graph deeper than 64 levels — corrupt or cyclic")
    b.position(addr.toInt)
    require(b.get() == 1, "v1 object header expected")
    b.get()
    val nMsgs = b.getShort.toInt & 0xffff
    b.getInt // refcount
    val blockSize = b.getInt
    b.getInt // alignment gap
    var attrs = Map.empty[String, Attr]
    var children = Map.empty[String, Parsed]
    var dims: Option[(Int, Int)] = None
    var dataAddr = Undef
    var chunked: Option[ChunkedLayout] = None
    var elem = ElemType(1, 4, littleEndian = true, signed = true) // default f32 LE
    var filters: Seq[Int] = Nil // pipeline order; applied in reverse on read
    var i = 0
    var pos: Long = b.position().toLong
    // message blocks beyond the first arrive via CONTINUATION messages
    // (0x0010) — real libhdf5 files with many attributes always have them
    var blockEnd: Long = pos + blockSize
    val moreBlocks = scala.collection.mutable.Queue.empty[(Long, Long)]
    while (i < nMsgs) {
      if (pos + 8 > blockEnd) {
        require(moreBlocks.nonEmpty, s"object header at $addr: ran out of blocks")
        val (s, len) = moreBlocks.dequeue()
        pos = s; blockEnd = s + len
      }
      b.position(pos.toInt)
      val tpe = b.getShort.toInt & 0xffff
      val size = b.getShort.toInt & 0xffff
      b.getInt // flags + reserved
      val dataStart = b.position()
      tpe match {
        case 0x0011 => // symbol table: walk the B-tree for children
          val btree = b.getLong
          val heap = b.getLong
          children = readGroupChildren(b, btree, heap, depth)
        case 0x000C =>
          val (n, a) = readAttr(b)
          attrs += (n -> a)
        case 0x0001 =>
          require(b.get() == 1, "v1 dataspace expected")
          val ndim = b.get().toInt
          b.get(); (0 until 5).foreach(_ => b.get())
          require(ndim == 2, s"only 2-D datasets supported, got $ndim")
          dims = Some((b.getLong.toInt, b.getLong.toInt))
        case 0x0003 => // datatype: remember element shape for data decode
          val classVer = b.get().toInt
          val bits0 = b.get().toInt
          b.get(); b.get()
          val sz = b.getInt
          val cls = classVer & 0x0f
          require(cls == 0 || cls == 1, s"dataset datatype class $cls unsupported")
          // decodeElem handles 1-8 byte elements; a corrupt size would
          // otherwise poison every downstream size product (nRaw, plainSize)
          require(sz >= 1 && sz <= 8, s"dataset element size $sz unsupported")
          elem = ElemType(cls, sz, littleEndian = (bits0 & 1) == 0,
            signed = cls == 1 || (bits0 & 0x08) != 0)
        case 0x000B => // filter pipeline: deflate and shuffle supported
          require(b.get() == 1, "v1 filter pipeline expected")
          val nf = b.get().toInt
          (0 until 6).foreach(_ => b.get())
          filters = (0 until nf).map { _ =>
            val id = b.getShort.toInt
            val nameLen = b.getShort.toInt
            b.getShort // flags
            val nVals = b.getShort.toInt
            (0 until nameLen).foreach(_ => b.get())
            (0 until nVals).foreach(_ => b.getInt)
            if (nVals % 2 == 1) b.getInt // pad
            require(id == 1 || id == 2, s"filter $id unsupported")
            id
          }
        case 0x0008 =>
          require(b.get() == 3, "v3 layout expected")
          b.get().toInt match {
            case 1 => dataAddr = b.getLong
            case 2 =>
              val nd = b.get().toInt
              require(nd == 3, s"chunked layout with $nd dims unsupported")
              val btree = b.getLong
              val cr = b.getInt
              val cc = b.getInt
              // raw file fields: validate before any size product uses them
              require(cr >= 1 && cr <= (1 << 16) && cc >= 1 && cc <= (1 << 16),
                s"corrupt chunk dims ${cr}x$cc")
              chunked = Some(ChunkedLayout(btree, cr, cc))
            case c => throw new IllegalArgumentException(s"layout class $c unsupported")
          }
        case 0x0010 => // continuation: another message block elsewhere
          moreBlocks.enqueue((b.getLong, b.getLong))
        case _ => // fill value, NIL, modification time…
      }
      pos = dataStart + size
      i += 1
    }
    val data = dims.map { case (rows, cols) =>
      // dims come straight off the file: corrupt/crafted values must fail
      // as a parse error here, not as a JVM-level NegativeArraySize/OOM
      // from an attacker-sized allocation below. Each factor is bounded
      // (a (2^31, 0) claim has product 0 but still allocates 2^31 row
      // references), and 2^28 floats (1 GiB) is far beyond any 2-D grid.
      require(rows >= 0 && cols >= 0 && rows <= (1 << 16) && cols <= (1 << 16) &&
          rows.toLong * cols <= (1L << 28),
        s"corrupt dataspace dims ${rows}x$cols")
      chunked match {
        case Some(cl) =>
          readChunkedData(b, cl, rows, cols, elem, filters)
        case None =>
          require(dataAddr != Undef, "dataset without layout address")
          require(filters.isEmpty, "filters require chunked layout")
          // contiguous data is stored verbatim, so its byte size is bounded
          // by the file itself (Long math: rows*cols*size can overflow Int)
          val nRaw = rows.toLong * cols * elem.size
          require(nRaw >= 0 && nRaw <= b.limit(),
            s"contiguous data of $nRaw bytes exceeds the file")
          val raw = new Array[Byte](nRaw.toInt)
          b.position(dataAddr.toInt)
          b.get(raw)
          val grid = Array.ofDim[Float](rows, cols)
          scatterChunk(raw, grid, 0, 0, rows, cols, rows, cols, elem)
          grid
      }
    }
    Parsed(attrs, children, data)
  }

  /** Decode one element at byte offset `off` of `raw` to Float. */
  private[qpe] def decodeElem(raw: Array[Byte], off: Int, e: ElemType): Float = {
    var v = 0L
    if (e.littleEndian) {
      var i = e.size - 1
      while (i >= 0) { v = (v << 8) | (raw(off + i) & 0xffL); i -= 1 }
    } else {
      var i = 0
      while (i < e.size) { v = (v << 8) | (raw(off + i) & 0xffL); i += 1 }
    }
    e.cls match {
      case 1 if e.size == 4 => java.lang.Float.intBitsToFloat(v.toInt)
      case 1 if e.size == 8 => java.lang.Double.longBitsToDouble(v).toFloat
      case 0 =>
        val signed =
          if (!e.signed || e.size == 8) v
          else { // sign-extend
            val shift = 64 - 8 * e.size
            (v << shift) >> shift
          }
        signed.toFloat
      case _ => throw new IllegalArgumentException(s"element $e unsupported")
    }
  }

  /** Copy a decoded chunk (or contiguous block) into the grid, clipping
    * edge chunks that overrun the dataset bounds.
    */
  private def scatterChunk(raw: Array[Byte], grid: Array[Array[Float]],
                           r0: Int, c0: Int, chunkRows: Int, chunkCols: Int,
                           rows: Int, cols: Int, e: ElemType): Unit = {
    var r = 0
    while (r < chunkRows && r0 + r < rows) {
      var c = 0
      while (c < chunkCols && c0 + c < cols) {
        grid(r0 + r)(c0 + c) = decodeElem(raw, (r * chunkCols + c) * e.size, e)
        c += 1
      }
      r += 1
    }
  }

  private[qpe] def inflate(raw: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      // truncated/corrupt stream: Inflater returns 0 wanting more input —
      // without this check the loop would spin forever instead of failing
      require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
        s"deflate stream truncated at $off of $expected bytes")
      off += n
    }
    inf.end()
    out
  }

  /** De-shuffle (filter id 2): bytes stored plane-by-plane back to
    * interleaved element order.
    */
  private[qpe] def unshuffle(raw: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return raw
    val n = raw.length / elemSize
    val out = new Array[Byte](raw.length)
    var j = 0
    while (j < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + j) = raw(j * n + i); i += 1 }
      j += 1
    }
    out
  }

  /** Walk a v1 chunk B-tree (any level) and materialize the dataset;
    * chunks absent from the tree stay at the float fill (NaN — ODIM
    * nodata; 0 for integer grids). `filters` is the pipeline in forward
    * (write) order; each chunk undoes it in REVERSE, skipping filters
    * whose bit is set in the chunk's filter mask — libhdf5 marks an
    * OPTIONAL filter it skipped (e.g. deflate that would have grown a
    * high-entropy chunk) exactly this way, and inflating such a chunk
    * would fail on a perfectly valid file.
    */
  private def readChunkedData(b: ByteBuffer, cl: ChunkedLayout, rows: Int,
                              cols: Int, e: ElemType,
                              filters: Seq[Int]): Array[Array[Float]] = {
    val fill = if (e.cls == 1) Float.NaN else 0.0f
    val grid = Array.fill(rows, cols)(fill)
    val plainSize = cl.chunkRows.toLong * cl.chunkCols * e.size
    require(plainSize > 0 && plainSize <= Int.MaxValue,
      s"chunk of $plainSize bytes unsupported")
    def walk(nodeAddr: Long, depth: Int): Unit = {
      // corrupt sibling/child links can form a cycle; real chunk trees for
      // ≤2^16 chunks are ≤3 levels — fail loudly instead of recursing forever
      require(depth < 64, "chunk B-tree deeper than 64 levels — corrupt or cyclic")
      b.position(nodeAddr.toInt)
      require((0 until 4).forall(i => b.get() == "TREE".charAt(i).toByte), "TREE expected")
      require(b.get() == 1, "chunk B-tree expected")
      val level = b.get().toInt
      val used = b.getShort.toInt & 0xffff
      b.getLong; b.getLong // siblings
      val base = nodeAddr + 24
      val keySize = 8 + 2 * 8 + 8 // nbytes+mask, 2 dim offsets + elem offset
      (0 until used).foreach { i =>
        b.position((base + i * (keySize + 8)).toInt)
        val nBytes = b.getInt
        val mask = b.getInt
        val r0 = b.getLong.toInt
        val c0 = b.getLong.toInt
        b.getLong // element-dim offset
        val child = b.getLong
        if (level > 0) walk(child, depth + 1)
        else {
          // stored chunk bytes live in the file — bound the allocation by it
          require(nBytes >= 0 && nBytes <= b.limit(),
            s"corrupt chunk size $nBytes")
          val stored = new Array[Byte](nBytes)
          b.position(child.toInt)
          b.get(stored)
          val raw = filters.zipWithIndex.reverse.foldLeft(stored) {
            case (acc, (_, idx)) if (mask & (1 << idx)) != 0 => acc // skipped
            case (acc, (1, _)) => inflate(acc, plainSize.toInt)
            case (acc, (2, _)) => unshuffle(acc, e.size)
            case (acc, _) => acc
          }
          scatterChunk(raw, grid, r0, c0, cl.chunkRows, cl.chunkCols, rows, cols, e)
        }
      }
    }
    walk(cl.btree, 0)
    grid
  }

  private def readGroupChildren(b: ByteBuffer, btreeAddr: Long,
                                heapAddr: Long, depth: Int): Map[String, Parsed] = {
    b.position(heapAddr.toInt)
    require((0 until 4).forall(i => b.get() == "HEAP".charAt(i).toByte), "HEAP expected")
    b.position(heapAddr.toInt + 24)
    val heapData = b.getLong
    b.position(btreeAddr.toInt)
    require((0 until 4).forall(i => b.get() == "TREE".charAt(i).toByte), "TREE expected")
    require(b.get() == 0, "group B-tree expected")
    val level = b.get().toInt
    require(level == 0, "multi-level B-trees not supported (≤8 SNODs suffice here)")
    val used = b.getShort.toInt & 0xffff
    b.getLong; b.getLong // siblings
    val snods = (0 until used).map { i =>
      b.position((btreeAddr + 24 + 8 + i * 16).toInt) // skip key[i], read child[i]
      b.getLong
    }
    snods.flatMap { snod =>
      b.position(snod.toInt)
      require((0 until 4).forall(i => b.get() == "SNOD".charAt(i).toByte), "SNOD expected")
      b.get(); b.get()
      val n = b.getShort.toInt & 0xffff
      (0 until n).map { j =>
        b.position((snod + 8 + j * 40).toInt)
        val nameOff = b.getLong
        val ohAddr = b.getLong
        val name = readHeapString(b, heapData + nameOff)
        name -> readObject(b, ohAddr, depth + 1)
      }
    }.toMap
  }

  private def readHeapString(b: ByteBuffer, addr: Long): String = {
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var p = addr.toInt
    while (b.get(p) != 0) { bytes += b.get(p); p += 1 }
    new String(bytes.toArray, "UTF-8")
  }

  private def readAttr(b: ByteBuffer): (String, Attr) = {
    val start = b.position()
    require(b.get() == 1, "v1 attribute expected"); b.get()
    val nameSize = b.getShort.toInt
    val dtSize = b.getShort.toInt
    val dsSize = b.getShort.toInt
    // signed-short reads: a corrupt high byte turns these negative, and an
    // unguarded allocation dies with NegativeArraySizeException (found by
    // the bit-flip fuzz spec) instead of a parse error
    require(nameSize >= 1 && nameSize <= b.limit(),
      s"corrupt attribute name size $nameSize")
    val nameBytes = new Array[Byte](nameSize - 1)
    b.get(nameBytes); b.get() // NUL
    val name = new String(nameBytes, "UTF-8")
    val dtStart = start + 8 + pad8(nameSize)
    b.position(dtStart)
    val classVer = b.get().toInt
    val cls = classVer & 0x0f
    b.get(); b.get(); b.get()
    val elemSize = b.getInt
    val dataStart = dtStart + pad8(dtSize) + pad8(dsSize)
    b.position(dataStart)
    val attr = cls match {
      case 3 =>
        require(elemSize >= 0 && elemSize <= b.remaining(),
          s"corrupt string attribute size $elemSize")
        val raw = new Array[Byte](elemSize)
        b.get(raw)
        Str(new String(raw.takeWhile(_ != 0), "UTF-8"))
      case 1 => Dbl(b.getDouble)
      case 0 => Lng(b.getLong)
      case c => throw new IllegalArgumentException(s"attribute class $c unsupported")
    }
    (name, attr)
  }
}
