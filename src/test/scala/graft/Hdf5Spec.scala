package graft

import java.nio.file.Files

import graft.qpe.Hdf5
import graft.qpe.Hdf5.{Attr, Data, Dbl, Group, Lng, Node, Parsed, Str}
import org.scalatest.funsuite.AnyFunSuite

/** S12 container: the minimal pure-JVM HDF5 writer/reader — byte-level
  * superblock conformance (the part any HDF5 1.x reader checks first) plus
  * structural roundtrips of the group/attribute/dataset subset ODIM needs.
  */
class Hdf5Spec extends AnyFunSuite {

  private def tmp(): String = Files.createTempFile("graft-h5", ".h5").toString

  test("superblock: signature, version 0, 8-byte offsets, EOF address = file size") {
    val path = tmp()
    Hdf5.write(path, Group(
      attrs = Seq("A" -> Str("x")),
      children = Seq("data" -> Data(Array(Array(1.0f, 2.0f))))))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    // the 8-byte format signature every HDF5 reader checks first
    assert(bytes.take(8).toSeq == Seq[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    assert(bytes(8) == 0)             // superblock version 0 (classic)
    assert(bytes(13) == 8)            // size of offsets
    assert(bytes(14) == 8)            // size of lengths
    val leafK = (bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8)
    assert(leafK > 0)                 // group leaf node K must be nonzero
    // end-of-file address (bytes 40-47 LE) matches the actual file length
    val eof = (0 until 8).map(i => (bytes(40 + i) & 0xffL) << (8 * i)).sum
    assert(eof == bytes.length)
  }

  test("roundtrip: nested groups, all three attribute types, float32 data with NaN") {
    val grid = Array(
      Array(1.5f, Float.NaN, -2.25f),
      Array(0.0f, 1e10f, -1e-10f))
    val root = Group(
      attrs = Seq("Conventions" -> Str("ODIM_H5/V2_3")),
      children = Seq(
        "what" -> Group(Seq(
          "object" -> Str("IMAGE"),
          "gain" -> Dbl(0.5),
          "count" -> Lng(-42L))),
        "dataset1" -> Group(children = Seq(
          "data1" -> Group(children = Seq(
            "data" -> Data(grid, Seq("CLASS" -> Str("IMAGE")))))))))
    val path = tmp()
    Hdf5.write(path, root)
    val back = Hdf5.read(path)
    assert(back.attrs("Conventions") == Str("ODIM_H5/V2_3"))
    assert(back.children("what").attrs == Map(
      "object" -> Str("IMAGE"), "gain" -> Dbl(0.5), "count" -> Lng(-42L)))
    val data = back.children("dataset1").children("data1").children("data")
    assert(data.attrs("CLASS") == Str("IMAGE"))
    val g = data.data.get
    assert(g.length == 2 && g(0).length == 3)
    assert(g(0)(0) == 1.5f && g(0)(1).isNaN && g(0)(2) == -2.25f)
    assert(g(1)(0) == 0.0f && g(1)(1) == 1e10f && g(1)(2) == -1e-10f)
  }

  test("children are stored and recovered regardless of declaration order") {
    // declared out of name order: the writer must sort into the B-tree/SNOD
    // (HDF5 symbol tables are name-ordered; a violating file is corrupt)
    val root = Group(children = Seq(
      "zeta" -> Group(Seq("k" -> Lng(1))),
      "alpha" -> Group(Seq("k" -> Lng(2))),
      "mid" -> Group(Seq("k" -> Lng(3)))))
    val path = tmp()
    Hdf5.write(path, root)
    val back = Hdf5.read(path)
    assert(back.children.keySet == Set("zeta", "alpha", "mid"))
    assert(back.children("alpha").attrs("k") == Lng(2))
    assert(back.children("zeta").attrs("k") == Lng(1))
  }

  test("chunked+deflate dataset roundtrips, including the clipped edge chunk") {
    // 10 rows at chunkRows=4 -> chunks at rows 0/4/8, last one 2 rows short;
    // values chosen so any offset slip is visible, NaN mass compresses well
    val grid = Array.tabulate(10, 7)((r, c) =>
      if ((r + c) % 3 == 0) Float.NaN else (r * 100 + c).toFloat)
    val path = tmp()
    Hdf5.write(path, Group(children = Seq(
      "data" -> Data(grid, Seq("CLASS" -> Str("IMAGE")), chunkRows = 4))))
    val back = Hdf5.read(path).children("data")
    assert(back.attrs("CLASS") == Str("IMAGE"))
    val g = back.data.get
    assert(g.length == 10 && g(0).length == 7)
    for (r <- 0 until 10; c <- 0 until 7) {
      if (grid(r)(c).isNaN) assert(g(r)(c).isNaN, s"($r,$c)")
      else assert(g(r)(c) == grid(r)(c), s"($r,$c): ${g(r)(c)}")
    }
    // compression actually engaged: smaller than the raw payload + overhead
    val packed = Files.size(java.nio.file.Paths.get(path))
    val contiguous = tmp()
    Hdf5.write(contiguous, Group(children = Seq("data" -> Data(grid))))
    assert(packed < Files.size(java.nio.file.Paths.get(contiguous)) + 200,
      s"chunked file $packed bytes suspiciously large")
  }

  test("chunk smaller than, equal to, and larger than the grid all roundtrip") {
    val grid = Array.tabulate(5, 3)((r, c) => (r * 10 + c).toFloat)
    Seq(1, 5, 64).foreach { cr =>
      val path = tmp()
      Hdf5.write(path, Group(children = Seq("data" -> Data(grid, Nil, cr))))
      val g = Hdf5.read(path).children("data").data.get
      assert(g.map(_.toSeq).toSeq == grid.map(_.toSeq).toSeq, s"chunkRows=$cr")
    }
  }

  test("non-ASCII attribute values roundtrip via UTF-8 (sizes from encoded bytes)") {
    // umlaut (2 UTF-8 bytes) + a supplementary-plane char (4 bytes, 2 Java
    // chars): byte-length/char-length divergence must not corrupt offsets
    val root = Group(
      attrs = Seq("place" -> Str("Zürich"), "emoji" -> Str("a😀b")),
      children = Seq("g" -> Group(Seq("note" -> Str("établi")))))
    val path = tmp()
    Hdf5.write(path, root)
    val back = Hdf5.read(path)
    assert(back.attrs("place") == Str("Zürich"))
    assert(back.attrs("emoji") == Str("a😀b"))
    assert(back.children("g").attrs("note") == Str("établi"))
  }

  test("property: randomized trees roundtrip losslessly (20 seeded cases)") {
    // dependency-free property drive (scalatestplus absent, same pattern as
    // PropertiesSpec): random nesting, attr mix, grid shapes, chunk modes
    val rnd = new scala.util.Random(7)
    def randAttr(): Attr = rnd.nextInt(3) match {
      case 0 => Str(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
      case 1 => Dbl(rnd.nextDouble() * 1e6 - 5e5)
      case _ => Lng(rnd.nextLong())
    }
    def randAttrs(): Seq[(String, Attr)] =
      (0 until rnd.nextInt(4)).map(i => s"a$i" -> randAttr())
    def randData(): Data = {
      val rows = 1 + rnd.nextInt(9)
      val cols = 1 + rnd.nextInt(9)
      val grid = Array.tabulate(rows, cols)((r, c) =>
        if (rnd.nextInt(5) == 0) Float.NaN else rnd.nextFloat() * 1000f)
      Data(grid, randAttrs(), chunkRows = Seq(0, 1, 3, 64)(rnd.nextInt(4)))
    }
    def randGroup(depth: Int): Group = Group(
      randAttrs(),
      (0 until rnd.nextInt(4)).map { i =>
        if (depth >= 2 || rnd.nextBoolean()) s"d$i" -> randData()
        else s"g$i" -> randGroup(depth + 1)
      })
    def check(exp: Node, got: Parsed): Unit = exp match {
      case g: Group =>
        assert(got.attrs == g.attrs.toMap)
        assert(got.children.keySet == g.children.map(_._1).toSet)
        g.children.foreach { case (n, c) => check(c, got.children(n)) }
      case d: Data =>
        assert(got.attrs == d.attrs.toMap)
        val back = got.data.get
        assert(back.length == d.grid.length)
        d.grid.indices.foreach { r =>
          d.grid(r).indices.foreach { c =>
            val (a, b) = (d.grid(r)(c), back(r)(c))
            assert((a.isNaN && b.isNaN) || a == b, s"($r,$c): $b != $a")
          }
        }
    }
    (1 to 20).foreach { i =>
      val root = randGroup(0)
      val path = tmp()
      Hdf5.write(path, root)
      check(root, Hdf5.read(path))
    }
  }

  test("empty group and empty-string attribute survive the roundtrip") {
    val root = Group(children = Seq(
      "how" -> Group(Seq("empty" -> Str(""))),
      "nothing" -> Group()))
    val path = tmp()
    Hdf5.write(path, root)
    val back = Hdf5.read(path)
    assert(back.children("nothing").attrs.isEmpty)
    assert(back.children("nothing").children.isEmpty)
    assert(back.children("how").attrs("empty") == Str(""))
  }
}
