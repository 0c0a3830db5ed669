package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Minimal NetCDF-3 "classic" codec (K4/S11) — no external library.
  *
  * Implements the public NetCDF Classic Format specification (the
  * CDF-1 on-disk layout: magic `CDF\x01`, big-endian header with
  * dim/gatt/var lists, fixed-variable section, then record slabs
  * interleaved per record). Scope is the L1 product's needs — NC_INT
  * and NC_DOUBLE variables, NC_CHAR/NC_INT/NC_DOUBLE attributes, one
  * optional unlimited (record) dimension — which covers the
  * reference's yearly flux file: flat double series over
  * (time, latitude, longitude) plus int QC flags and a crs variable
  * (reference: code/data_constructors/nc_constructors.py:433-530,
  * 557-719).
  *
  * The writer produces a byte stream any conforming netCDF consumer
  * can open; [[read]] parses the same layout back for roundtrip
  * verification and for the S11 scan seam.
  */
object NetCdf {

  // nc_type codes from the classic format spec
  val NcChar = 2
  val NcInt = 4
  val NcDouble = 6

  sealed trait AttrVal
  final case class TextAttr(s: String) extends AttrVal
  final case class IntAttr(vs: Seq[Int]) extends AttrVal
  final case class DoubleAttr(vs: Seq[Double]) extends AttrVal

  /** length == 0 marks the (single) unlimited/record dimension. */
  final case class Dim(name: String, length: Int)

  /** `data` always travels as doubles; `ncType` selects the on-disk
    * encoding (NcInt truncates). Element order is row-major over the
    * variable's dims, record dim slowest. */
  final case class Var(name: String, dimIds: Seq[Int], ncType: Int,
      attrs: Seq[(String, AttrVal)], data: Array[Double])

  final case class Dataset(dims: Seq[Dim],
      globalAttrs: Seq[(String, AttrVal)], vars: Seq[Var]) {
    def numRecs: Int = {
      val recId = dims.indexWhere(_.length == 0)
      if (recId < 0) 0
      else vars.collectFirst {
        case v if v.dimIds.headOption.contains(recId) =>
          v.data.length / math.max(1, slabElems(this, v))
      }.getOrElse(0)
    }
  }

  private def typeSize(t: Int): Int = t match {
    case NcChar => 1; case NcInt => 4; case NcDouble => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  /** Elements in one slab: product of non-record dim lengths. */
  private def slabElems(ds: Dataset, v: Var): Int =
    v.dimIds.map(ds.dims(_)).filter(_.length != 0)
      .map(_.length).product

  private def isRecord(ds: Dataset, v: Var): Boolean =
    v.dimIds.headOption.exists(ds.dims(_).length == 0)

  /** Per-variable vsize field: slab bytes rounded up to 4. */
  private def vsize(ds: Dataset, v: Var): Int =
    pad4(slabElems(ds, v) * typeSize(v.ncType))

  // --- writer ---------------------------------------------------------

  def write(path: String, ds: Dataset): Unit = {
    val recDims = ds.dims.count(_.length == 0)
    require(recDims <= 1, s"classic format allows one record dim, got $recDims")
    ds.vars.foreach { v =>
      val fixed = slabElems(ds, v)
      val expect =
        if (isRecord(ds, v)) fixed.toLong * ds.numRecs else fixed.toLong
      require(v.data.length == expect,
        s"${v.name}: data length ${v.data.length} != dim product $expect")
      require(v.dimIds.count(ds.dims(_).length == 0) <= (
        if (isRecord(ds, v)) 1 else 0) &&
        v.dimIds.drop(1).forall(ds.dims(_).length != 0),
        s"${v.name}: record dim must be the first (slowest) dim")
    }

    // pass 1: header with begin=0 to learn its length
    val probe = headerBytes(ds, offsets = ds.vars.map(_ => 0L))
    // fixed vars first, then the record section
    var cursor = probe.length.toLong
    val fixedOffsets = scala.collection.mutable.Map[String, Long]()
    ds.vars.filterNot(isRecord(ds, _)).foreach { v =>
      fixedOffsets(v.name) = cursor
      cursor += vsize(ds, v)
    }
    val recStart = cursor
    var recOff = 0L
    val recOffsets = scala.collection.mutable.Map[String, Long]()
    ds.vars.filter(isRecord(ds, _)).foreach { v =>
      recOffsets(v.name) = recStart + recOff
      recOff += vsize(ds, v)
    }
    val recSlabBytes = recOff
    val offsets = ds.vars.map(v =>
      if (isRecord(ds, v)) recOffsets(v.name) else fixedOffsets(v.name))
    val header = headerBytes(ds, offsets)
    require(header.length == probe.length, "header size instability")

    val total = recStart + recSlabBytes * ds.numRecs
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.BIG_ENDIAN)
    out.put(header)
    // fixed data
    ds.vars.filterNot(isRecord(ds, _)).foreach { v =>
      putSlab(out, v, v.data)
    }
    // record data: interleave slabs per record
    val recVars = ds.vars.filter(isRecord(ds, _))
    for (r <- 0 until ds.numRecs; v <- recVars) {
      val n = slabElems(ds, v)
      putSlab(out, v, v.data.slice(r * n, (r + 1) * n))
    }
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    Files.write(Paths.get(path), out.array())
  }

  private def putSlab(out: ByteBuffer, v: Var, slab: Array[Double]): Unit = {
    val start = out.position()
    v.ncType match {
      case NcDouble => slab.foreach(out.putDouble)
      case NcInt => slab.foreach(d => out.putInt(d.toInt))
      case other => throw new IllegalArgumentException(s"nc_type $other")
    }
    while ((out.position() - start) % 4 != 0) out.put(0.toByte)
  }

  private def headerBytes(ds: Dataset, offsets: Seq[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeBytes("CDF"); o.writeByte(1)        // magic, version 1
    o.writeInt(ds.numRecs)
    // dim list
    if (ds.dims.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0A); o.writeInt(ds.dims.length)
      ds.dims.foreach { d => writeName(o, d.name); o.writeInt(d.length) }
    }
    writeAttrList(o, ds.globalAttrs)
    // var list
    if (ds.vars.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0B); o.writeInt(ds.vars.length)
      ds.vars.zip(offsets).foreach { case (v, off) =>
        writeName(o, v.name)
        o.writeInt(v.dimIds.length)
        v.dimIds.foreach(o.writeInt)
        writeAttrList(o, v.attrs)
        o.writeInt(v.ncType)
        o.writeInt(vsize(ds, v))
        o.writeInt(off.toInt)                  // CDF-1: 4-byte begin
      }
    }
    o.flush(); bos.toByteArray
  }

  private def writeName(o: DataOutputStream, name: String): Unit = {
    val b = name.getBytes(StandardCharsets.UTF_8)
    o.writeInt(b.length); o.write(b)
    (b.length until pad4(b.length)).foreach(_ => o.writeByte(0))
  }

  private def writeAttrList(o: DataOutputStream,
      attrs: Seq[(String, AttrVal)]): Unit = {
    if (attrs.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0C); o.writeInt(attrs.length)
      attrs.foreach { case (name, value) =>
        writeName(o, name)
        value match {
          case TextAttr(s) =>
            val b = s.getBytes(StandardCharsets.UTF_8)
            o.writeInt(NcChar); o.writeInt(b.length); o.write(b)
            (b.length until pad4(b.length)).foreach(_ => o.writeByte(0))
          case IntAttr(vs) =>
            o.writeInt(NcInt); o.writeInt(vs.length); vs.foreach(o.writeInt)
          case DoubleAttr(vs) =>
            o.writeInt(NcDouble); o.writeInt(vs.length)
            vs.foreach(o.writeDouble)
        }
      }
    }
  }

  // --- reader ---------------------------------------------------------

  def read(path: String): Dataset =
    parse(Files.readAllBytes(Paths.get(path)))

  def parse(bytes: Array[Byte]): Dataset = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = new Array[Byte](3); b.get(magic)
    require(new String(magic, StandardCharsets.US_ASCII) == "CDF",
      "not a netCDF classic byte stream")
    val version = b.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    val numRecsRaw = b.getInt // -1 = STREAMING: derive from file size
    val dims = readTagged(b, 0x0A) { _ =>
      Dim(readName(b), b.getInt)
    }
    val gattrs = readAttrList(b)
    final case class RawVar(name: String, dimIds: Seq[Int],
        attrs: Seq[(String, AttrVal)], ncType: Int, vsize: Int, begin: Long)
    val raws = readTagged(b, 0x0B) { _ =>
      val name = readName(b)
      val rank = b.getInt
      val dimIds = (0 until rank).map(_ => b.getInt)
      val attrs = readAttrList(b)
      val t = b.getInt; val vs = b.getInt
      val begin = if (version == 1) b.getInt.toLong else b.getLong
      RawVar(name, dimIds, attrs, t, vs, begin)
    }
    val ds0 = Dataset(dims, gattrs,
      raws.map(r => Var(r.name, r.dimIds, r.ncType, r.attrs,
        Array.empty[Double])))
    val recRaws = raws.filter(
      _.dimIds.headOption.exists(dims(_).length == 0))
    val recSlabBytes = recRaws.map(_.vsize.toLong).sum
    // STREAMING marker (numrecs = 0xFFFFFFFF): the record count is
    // implied by the bytes past the record section's start.
    val numRecs =
      if (numRecsRaw >= 0) numRecsRaw
      else if (recRaws.isEmpty || recSlabBytes == 0) 0
      else ((bytes.length - recRaws.map(_.begin).min) / recSlabBytes).toInt
    val vars = raws.map { r =>
      val v = Var(r.name, r.dimIds, r.ncType, r.attrs, Array.empty)
      val slab = slabElems(ds0, v)
      val rec = r.dimIds.headOption.exists(dims(_).length == 0)
      val nSlabs = if (rec) numRecs else 1
      val out = new Array[Double](slab * nSlabs)
      val stride = if (rec) recSlabBytes else 0L
      for (s <- 0 until nSlabs) {
        val base = r.begin + s * stride
        for (i <- 0 until slab) {
          out(s * slab + i) = r.ncType match {
            case NcDouble => b.getDouble((base + i * 8L).toInt)
            case NcInt => b.getInt((base + i * 4L).toInt).toDouble
            case other =>
              throw new IllegalArgumentException(s"nc_type $other")
          }
        }
      }
      Var(r.name, r.dimIds, r.ncType, r.attrs, out)
    }
    Dataset(dims, gattrs, vars)
  }

  private def readTagged[A](b: ByteBuffer, tag: Int)(f: Int => A): Seq[A] = {
    val t = b.getInt; val n = b.getInt
    require(t == tag || (t == 0 && n == 0), s"expected tag $tag, got $t")
    (0 until n).map(f)
  }

  private def readName(b: ByteBuffer): String = {
    val n = b.getInt
    val arr = new Array[Byte](n); b.get(arr)
    (n until pad4(n)).foreach(_ => b.get())
    new String(arr, StandardCharsets.UTF_8)
  }

  private def readAttrList(b: ByteBuffer): Seq[(String, AttrVal)] =
    readTagged(b, 0x0C) { _ =>
      val name = readName(b)
      val t = b.getInt; val n = b.getInt
      val v: AttrVal = t match {
        case NcChar =>
          val arr = new Array[Byte](n); b.get(arr)
          (n until pad4(n)).foreach(_ => b.get())
          TextAttr(new String(arr, StandardCharsets.UTF_8))
        case NcInt => IntAttr((0 until n).map(_ => b.getInt))
        case NcDouble => DoubleAttr((0 until n).map(_ => b.getDouble))
        case other => throw new IllegalArgumentException(s"attr type $other")
      }
      name -> v
    }

  /** CF time origin used by the reference product: seconds since
    * 1800-01-01 00:00:00 (nc_constructors.py:628-643). */
  val Epoch1800Sec: Long =
    java.time.LocalDateTime.of(1800, 1, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC)
}
