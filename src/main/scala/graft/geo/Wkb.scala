package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal planar geometry model + WKB codec (dependency-free — no JTS in
  * the offline jar set, see SURVEY.md §7.4).
  *
  * Scope: Point / Polygon / MultiPolygon — the full geometry surface the
  * reference exercises (`load_report.py:45-57` dispatches only Polygon and
  * MultiPolygon; points arise as centroids/cells).
  *
  * Rings are stored as parallel coordinate arrays (cache-friendly, no
  * per-vertex boxing); shells and holes are distinguished positionally as
  * in WKB (first ring = shell).
  */
object Wkb {

  final case class Ring(xs: Array[Double], ys: Array[Double]) {
    def size: Int = xs.length
  }
  final case class Polygon(rings: Array[Ring]) {
    def shell: Ring = rings(0)
    def holes: Array[Ring] = rings.drop(1)
  }

  sealed trait Geom
  final case class Point(x: Double, y: Double) extends Geom
  final case class Poly(p: Polygon) extends Geom
  final case class MultiPoly(ps: Array[Polygon]) extends Geom

  val TPoint = 1
  val TPolygon = 3
  val TMultiPolygon = 6

  /** Parse standard WKB (either byte order; 2-D only). */
  def parse(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf)
  }

  private def readGeom(buf: ByteBuffer): Geom = {
    val bo = buf.get()
    buf.order(if (bo == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    // mask off EWKB SRID flag (0x20000000) if present
    val rawType = buf.getInt()
    val hasSrid = (rawType & 0x20000000) != 0
    if (hasSrid) buf.getInt() // skip srid
    // EWKB Z/M flags and ISO-WKB 1000/2000/3000 type offsets carry extra
    // per-vertex doubles — silently masking them off would read Z values
    // as the next vertex's X and corrupt every coordinate. Fail fast.
    if ((rawType & 0xC0000000) != 0 || (rawType & 0x1FFFFFFF) > 999)
      throw new IllegalArgumentException(
        f"unsupported 3-D/measured WKB geometry (type word 0x$rawType%08x): only 2-D supported")
    rawType & 0xFF match {
      case TPoint   => Point(buf.getDouble(), buf.getDouble())
      case TPolygon => Poly(readPolygon(buf))
      case TMultiPolygon =>
        val n = buf.getInt()
        val ps = new Array[Polygon](n)
        var i = 0
        while (i < n) {
          // each element is a full WKB geometry with its own byte-order byte
          val g = readGeom(buf)
          ps(i) = g match {
            case Poly(p) => p
            case other   => throw new IllegalArgumentException(s"MultiPolygon element is $other")
          }
          i += 1
        }
        MultiPoly(ps)
      case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
    }
  }

  private def readPolygon(buf: ByteBuffer): Polygon = {
    val nRings = buf.getInt()
    val rings = new Array[Ring](nRings)
    var r = 0
    while (r < nRings) {
      val n = buf.getInt()
      val xs = new Array[Double](n)
      val ys = new Array[Double](n)
      var i = 0
      while (i < n) { xs(i) = buf.getDouble(); ys(i) = buf.getDouble(); i += 1 }
      rings(r) = Ring(xs, ys)
      r += 1
    }
    Polygon(rings)
  }

  /** Serialize to little-endian WKB. */
  def write(g: Geom): Array[Byte] = {
    val buf = ByteBuffer.allocate(sizeOf(g)).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(buf, g)
    buf.array()
  }

  private def sizeOf(g: Geom): Int = g match {
    case Point(_, _) => 1 + 4 + 16
    case Poly(p)     => 1 + 4 + 4 + p.rings.map(r => 4 + 16 * r.size).sum
    case MultiPoly(ps) => 1 + 4 + 4 + ps.map(p => sizeOf(Poly(p))).sum
  }

  private def writeGeom(buf: ByteBuffer, g: Geom): Unit = g match {
    case Point(x, y) =>
      buf.put(1.toByte).putInt(TPoint).putDouble(x).putDouble(y)
    case Poly(p) =>
      buf.put(1.toByte).putInt(TPolygon).putInt(p.rings.length)
      p.rings.foreach { r =>
        buf.putInt(r.size)
        var i = 0
        while (i < r.size) { buf.putDouble(r.xs(i)).putDouble(r.ys(i)); i += 1 }
      }
    case MultiPoly(ps) =>
      buf.put(1.toByte).putInt(TMultiPolygon).putInt(ps.length)
      ps.foreach(p => writeGeom(buf, Poly(p)))
  }

  /** Strip a GeoPackage geometry blob header ('GP' magic, version, flags,
    * srs_id, optional envelope) down to the raw WKB, returning (srid, wkb).
    * Blob layout per the GPKG spec; the reference's lu.gpkg uses flags
    * 0b11 = little-endian + XY envelope (SURVEY.md §1.2). */
  def fromGpkg(blob: Array[Byte]): (Int, Array[Byte]) = {
    require(blob.length > 8 && blob(0) == 'G' && blob(1) == 'P', "not a GPKG geometry blob")
    val flags = blob(3)
    val envCode = (flags >> 1) & 0x7
    val envBytes = envCode match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => throw new IllegalArgumentException(s"invalid GPKG envelope code $envCode")
    }
    val littleEndian = (flags & 1) == 1
    val sridBuf = ByteBuffer.wrap(blob, 4, 4)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val srid = sridBuf.getInt()
    (srid, java.util.Arrays.copyOfRange(blob, 8 + envBytes, blob.length))
  }

  /** Encode a GPKG geometry blob (writer twin of [[fromGpkg]]): 'GP',
    * version 0, flags 0b11 (little-endian + 32-byte envelope), srid, the
    * envelope in GPKG order (minx, maxx, miny, maxy), then the WKB. */
  def toGpkg(srid: Int, wkb: Array[Byte]): Array[Byte] = {
    val env = graft.geo.Geo.envelope(parse(wkb))
    val out = ByteBuffer.allocate(8 + 32 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put('G'.toByte).put('P'.toByte).put(0.toByte).put(3.toByte)
    out.putInt(srid)
    out.putDouble(env.xmin).putDouble(env.xmax).putDouble(env.ymin).putDouble(env.ymax)
    out.put(wkb)
    out.array()
  }

  /** Normalize any parsed geometry to MultiPolygon parts (the reference's
    * Polygon-vs-MultiPolygon dispatch, load_report.py:45-57). */
  def asPolygons(g: Geom): Array[Polygon] = g match {
    case Poly(p)       => Array(p)
    case MultiPoly(ps) => ps
    case Point(_, _)   => throw new IllegalArgumentException("point has no polygon parts")
  }
}
