package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import Wkb._

/** Property-style tests use deterministic seeded sampling (no
  * scalatest-scalacheck bridge in the offline cache). */
object Samples {
  def doubles(seed: Long, lo: Double, hi: Double, n: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(lo + (hi - lo) * r.nextDouble())
  }
}

class GeoKernelSpec extends AnyFunSuite {

  private def square(cx: Double, cy: Double, half: Double): Polygon =
    Polygon(Array(Ring(
      Array(cx - half, cx + half, cx + half, cx - half, cx - half),
      Array(cy - half, cy - half, cy + half, cy + half, cy - half))))

  test("WKB round-trip: polygon") {
    val p = Poly(square(3.0, 4.0, 1.5))
    val back = Wkb.parse(Wkb.write(p))
    assert(Geo.area(back) === Geo.area(p))
    assert(Geo.envelope(back) === Geo.envelope(p))
  }

  test("WKB round-trip: multipolygon with hole") {
    val outer = square(0, 0, 10)
    val hole = square(0, 0, 2).rings(0)
    val withHole = Polygon(Array(outer.rings(0), hole))
    val mp = MultiPoly(Array(withHole, square(100, 100, 1)))
    val back = Wkb.parse(Wkb.write(mp))
    assert(math.abs(Geo.area(back) - (400.0 - 16.0 + 4.0)) < 1e-9)
    assert(Geo.geometryType(back) === "MultiPolygon")
  }

  test("big-endian WKB parses identically") {
    val le = Wkb.write(Poly(square(1, 2, 3)))
    // rewrite as big-endian by hand: flip byte-order flag and all fields
    val buf = java.nio.ByteBuffer.allocate(le.length)
    buf.put(0.toByte) // big-endian marker
    val src = java.nio.ByteBuffer.wrap(le).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    src.get()
    buf.putInt(src.getInt())
    val nRings = src.getInt(); buf.putInt(nRings)
    for (_ <- 0 until nRings) {
      val n = src.getInt(); buf.putInt(n)
      for (_ <- 0 until 2 * n) buf.putDouble(src.getDouble())
    }
    assert(Geo.area(Wkb.parse(buf.array())) === Geo.area(Wkb.parse(le)))
  }

  test("shoelace area: known triangle") {
    val tri = Polygon(Array(Ring(Array(0, 4, 0, 0), Array(0, 0, 3, 0))))
    assert(math.abs(Geo.polygonArea(tri) - 6.0) < 1e-12)
  }

  test("area invariant under vertex rotation (property)") {
    for (((cx, cy), (half, rot)) <- Samples.doubles(1, -100, 100, 30)
           .zip(Samples.doubles(2, -100, 100, 30))
           .zip(Samples.doubles(3, 0.1, 50, 30).zip(Seq.tabulate(30)(_ % 3 + 1)))) {
      val r = square(cx, cy, half).rings(0)
      // rotate starting vertex (drop duplicate closing point first)
      val open = (r.xs.init, r.ys.init)
      val k = rot % open._1.length
      val rx = open._1.drop(k) ++ open._1.take(k)
      val ry = open._2.drop(k) ++ open._2.take(k)
      val rotated = Polygon(Array(Ring(rx :+ rx.head, ry :+ ry.head)))
      assert(math.abs(Geo.polygonArea(rotated) - 4 * half * half) < 1e-6)
    }
  }

  test("centroid: square and square-with-hole") {
    val (cx, cy) = Geo.centroid(Poly(square(5, 7, 2)))
    assert(math.abs(cx - 5.0) < 1e-12 && math.abs(cy - 7.0) < 1e-12)
    // off-center hole pushes centroid away from the hole
    val outer = square(0, 0, 10).rings(0)
    val hole = square(5, 0, 2).rings(0)
    val (hx, hy) = Geo.centroid(Poly(Polygon(Array(outer, hole))))
    assert(hx < 0.0 && math.abs(hy) < 1e-9)
  }

  test("point-in-polygon: inside, outside, in-hole") {
    val outer = square(0, 0, 10).rings(0)
    val hole = square(0, 0, 2).rings(0)
    val g = Poly(Polygon(Array(outer, hole)))
    assert(Geo.contains(g, 5, 5))
    assert(!Geo.contains(g, 11, 0))
    assert(!Geo.contains(g, 0, 0)) // inside the hole
    assert(Geo.contains(g, 0, 3))  // between hole and shell
  }

  test("envelope") {
    val e = Geo.envelope(MultiPoly(Array(square(0, 0, 1), square(10, -5, 2))))
    assert(e === Geo.Env(-1, -7, 12, 1))
  }

  test("union-collect area = sum of disjoint parts (property)") {
    for (k <- 1 to 6) {
      val parts = (0 until k).map(i => Poly(square(i * 100.0, 0, 10)): Geom)
      val u = Geo.unionCollect(parts)
      assert(math.abs(Geo.area(u) - k * 400.0) < 1e-9)
      assert(Geo.area(u) >= parts.map(Geo.area).max - 1e-9)
    }
  }

  test("rectangle-polygon intersection: overlap, containment both ways, disjoint, hole") {
    val g = Poly(square(0, 0, 10))
    assert(Geo.intersectsBox(g, 5, 5, 15, 15))      // partial overlap
    assert(Geo.intersectsBox(g, -1, -1, 1, 1))      // box inside polygon
    assert(Geo.intersectsBox(g, -20, -20, 20, 20))  // polygon inside box
    assert(!Geo.intersectsBox(g, 11, 11, 15, 15))   // disjoint
    assert(Geo.intersectsBox(g, 9, -1, 12, 1))      // straddles an edge
    // box entirely inside a hole → no intersection
    val holed = Poly(Polygon(Array(square(0, 0, 10).rings(0), square(0, 0, 4).rings(0))))
    assert(!Geo.intersectsBox(holed, -1, -1, 1, 1))
    assert(Geo.intersectsBox(holed, 3, 3, 5, 5))    // straddles the hole edge
  }

  test("GPKG blob header strip (flags=0b11: LE + XY envelope)") {
    val wkb = Wkb.write(Poly(square(471700, 9873100, 50)))
    val blob = java.nio.ByteBuffer.allocate(8 + 32 + wkb.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    blob.put('G'.toByte).put('P'.toByte).put(0.toByte).put(3.toByte)
    blob.putInt(100000)
    blob.putDouble(0).putDouble(0).putDouble(0).putDouble(0) // envelope
    blob.put(wkb)
    val (srid, stripped) = Wkb.fromGpkg(blob.array())
    assert(srid === 100000)
    assert(Geo.area(Wkb.parse(stripped)) === Geo.area(Wkb.parse(wkb)))
  }
}

class CrsSpec extends AnyFunSuite {

  test("UTM 50S anchors: central meridian and equator") {
    // on the central meridian (117°E) easting is exactly 500000
    val (e1, _) = Crs.utm50sForward(117.0, -5.0)
    assert(math.abs(e1 - 500000.0) < 1e-6)
    // at the equator northing equals the southern false northing
    val (_, n1) = Crs.utm50sForward(117.5, 0.0)
    assert(math.abs(n1 - 10000000.0) < 1e-6)
  }

  test("UTM 50S known point: scale factor at central meridian") {
    // 1° of latitude along the central meridian ≈ 110574.4 m × k0
    val (_, nA) = Crs.utm50sForward(117.0, -1.0)
    val (_, nB) = Crs.utm50sForward(117.0, 0.0)
    val dist = nB - nA
    // meridian arc length for WGS84 near equator ≈ 110574.39 m
    assert(math.abs(dist - 0.9996 * 110574.39) < 1.0)
  }

  test("UTM 50S round-trip over the lu fixture envelope (property)") {
    // fixture envelope: x 471655–478475, y 9873071–9882889 (SURVEY §7.4)
    for ((x, y) <- Samples.doubles(4, 471000, 479000, 50)
           .zip(Samples.doubles(5, 9873000, 9883000, 50))) {
      val (lon, lat) = Crs.utm50sInverse(x, y)
      val (x2, y2) = Crs.utm50sForward(lon, lat)
      assert(math.abs(x2 - x) < 1e-4 && math.abs(y2 - y) < 1e-4)
    }
  }

  test("Web Mercator: known values and round-trip") {
    val (x, y) = Crs.webMercatorForward(180.0, 0.0)
    assert(math.abs(x - 20037508.342789244) < 1e-6 && math.abs(y) < 1e-9)
    for ((lon, lat) <- Samples.doubles(6, -179, 179, 50)
           .zip(Samples.doubles(7, -85, 85, 50))) {
      val (mx, my) = Crs.webMercatorForward(lon, lat)
      val (lon2, lat2) = Crs.webMercatorInverse(mx, my)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("transform composition: UTM → 3857 → 4326 ≈ UTM inverse") {
    val t1 = Crs.transform(32750, 3857)
    val t2 = Crs.transform(3857, 4326)
    val direct = Crs.transform(100000, 4326) // alias srid
    val (x, y) = (475000.0, 9878000.0)
    val (mx, my) = t1(x, y)
    val (lon1, lat1) = t2(mx, my)
    val (lon2, lat2) = direct(x, y)
    assert(math.abs(lon1 - lon2) < 1e-9 && math.abs(lat1 - lat2) < 1e-9)
  }
}
