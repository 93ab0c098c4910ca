package graft.geo

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import Wkb._

/** ScalaCheck property suite for the geometry kernel (SURVEY.md §5 item 4)
  * — runs under sbt's native ScalaCheck framework (no scalatest bridge). */
object GeoProperties extends Properties("geo") {

  private val coord = Gen.choose(-1000.0, 1000.0)
  private val side = Gen.choose(0.1, 100.0)

  private def square(cx: Double, cy: Double, h: Double): Polygon =
    Polygon(Array(Ring(
      Array(cx - h, cx + h, cx + h, cx - h, cx - h),
      Array(cy - h, cy - h, cy + h, cy + h, cy - h))))

  property("wkb round-trip preserves area and envelope") =
    forAll(coord, coord, side) { (cx, cy, h) =>
      val g = Poly(square(cx, cy, h))
      val back = Wkb.parse(Wkb.write(g))
      Geo.area(back) == Geo.area(g) && Geo.envelope(back) == Geo.envelope(g)
    }

  property("area of an axis-aligned square is side²") =
    forAll(coord, coord, side) { (cx, cy, h) =>
      math.abs(Geo.polygonArea(square(cx, cy, h)) - 4 * h * h) < 1e-6
    }

  property("union area >= max part area; equals sum for disjoint parts") =
    forAll(Gen.choose(1, 5), side) { (k, h) =>
      val parts = (0 until k).map(i => Poly(square(i * 1000.0, 0, h)): Geom)
      val u = Geo.unionCollect(parts)
      val total = Geo.area(u)
      math.abs(total - k * 4 * h * h) < 1e-6 && total >= parts.map(Geo.area).max - 1e-9
    }

  property("centroid of a square is its center") =
    forAll(coord, coord, side) { (cx, cy, h) =>
      val (x, y) = Geo.centroid(Poly(square(cx, cy, h)))
      math.abs(x - cx) < 1e-6 && math.abs(y - cy) < 1e-6
    }

  property("points inside/outside a square classify correctly") =
    forAll(coord, coord, Gen.choose(1.0, 50.0), Gen.choose(-0.99, 0.99),
      Gen.choose(-0.99, 0.99)) { (cx, cy, h, fx, fy) =>
      val g = Poly(square(cx, cy, h))
      Geo.contains(g, cx + fx * h, cy + fy * h) &&
        !Geo.contains(g, cx + (2 + fx) * h + 3 * h, cy)
    }

  property("utm 50S forward/inverse round-trip (fixture region)") =
    forAll(Gen.choose(471000.0, 479000.0), Gen.choose(9873000.0, 9883000.0)) { (x, y) =>
      val (lon, lat) = Crs.utm50sInverse(x, y)
      val (x2, y2) = Crs.utm50sForward(lon, lat)
      math.abs(x2 - x) < 1e-4 && math.abs(y2 - y) < 1e-4
    }

  property("web-mercator round-trip") =
    forAll(Gen.choose(-179.0, 179.0), Gen.choose(-85.0, 85.0)) { (lon, lat) =>
      val (mx, my) = Crs.webMercatorForward(lon, lat)
      val (lon2, lat2) = Crs.webMercatorInverse(mx, my)
      math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9
    }
}
