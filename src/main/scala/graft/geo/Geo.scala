package graft.geo

import Wkb._

/** Planar geometry kernel: the scalar math behind the spatial UDF surface
  * (SURVEY.md §2.7 G1–G9). Pure functions over the Wkb model.
  *
  * Conventions: shoelace treats ring orientation via |signed area|; holes
  * subtract. Point-in-polygon uses ray casting with the even-odd rule
  * (boundary points count as inside — adequate for cell-center tests,
  * matching terra::extract / GEE filterBounds semantics closely enough
  * for grid data).
  */
object Geo {

  def signedRingArea(r: Ring): Double = {
    var s = 0.0
    var i = 0
    val n = r.size
    while (i < n) {
      val j = (i + 1) % n
      s += r.xs(i) * r.ys(j) - r.xs(j) * r.ys(i)
      i += 1
    }
    s / 2.0
  }

  /** Area of a polygon: |shell| − Σ|holes| (planar, coordinate units²).
    * The reference measures in Web-Mercator meters (distorted) — we
    * replicate by transforming first (load_report.py:376-380). */
  def polygonArea(p: Polygon): Double = {
    var a = math.abs(signedRingArea(p.shell))
    var i = 1
    while (i < p.rings.length) { a -= math.abs(signedRingArea(p.rings(i))); i += 1 }
    a
  }

  def area(g: Geom): Double = g match {
    case Point(_, _)   => 0.0
    case Poly(p)       => polygonArea(p)
    case MultiPoly(ps) => ps.map(polygonArea).sum
  }

  /** Area-weighted centroid over all parts (holes subtract), matching
    * shapely's centroid for polygons (load_report.py:334-337). */
  def centroid(g: Geom): (Double, Double) = g match {
    case Point(x, y) => (x, y)
    case other =>
      // Per ring: signed area sa = Σcross/2, centroid (sx/(6·sa), sy/(6·sa)).
      // Weight each ring by |area|, +1 for shells, −1 for holes (dividing by
      // the signed sa makes the formula orientation-independent).
      var cx = 0.0; var cy = 0.0; var atot = 0.0
      Wkb.asPolygons(other).foreach { p =>
        var ri = 0
        while (ri < p.rings.length) {
          val r = p.rings(ri)
          val sign = if (ri == 0) 1.0 else -1.0
          var sx = 0.0; var sy = 0.0; var cross2 = 0.0
          var i = 0
          val n = r.size
          while (i < n) {
            val j = (i + 1) % n
            val cross = r.xs(i) * r.ys(j) - r.xs(j) * r.ys(i)
            sx += (r.xs(i) + r.xs(j)) * cross
            sy += (r.ys(i) + r.ys(j)) * cross
            cross2 += cross
            i += 1
          }
          val sa = cross2 / 2.0
          if (sa != 0.0) {
            val w = sign * math.abs(sa)
            cx += w * (sx / (6.0 * sa))
            cy += w * (sy / (6.0 * sa))
            atot += w
          }
          ri += 1
        }
      }
      if (atot == 0.0) (0.0, 0.0) else (cx / atot, cy / atot)
  }

  final case class Env(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  /** Envelope/bounds (total_bounds per geometry, load_report.py:322-326). */
  def envelope(g: Geom): Env = g match {
    case Point(x, y) => Env(x, y, x, y)
    case other =>
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      Wkb.asPolygons(other).foreach { p =>
        p.rings.foreach { r =>
          var i = 0
          while (i < r.size) {
            if (r.xs(i) < xmin) xmin = r.xs(i)
            if (r.xs(i) > xmax) xmax = r.xs(i)
            if (r.ys(i) < ymin) ymin = r.ys(i)
            if (r.ys(i) > ymax) ymax = r.ys(i)
            i += 1
          }
        }
      }
      Env(xmin, ymin, xmax, ymax)
  }

  private[geo] def pointInRing(x: Double, y: Double, r: Ring): Boolean = {
    var inside = false
    var i = 0
    var j = r.size - 1
    while (i < r.size) {
      val xi = r.xs(i); val yi = r.ys(i)
      val xj = r.xs(j); val yj = r.ys(j)
      if (((yi > y) != (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Point-in-polygon: inside the shell of any part, outside its holes
    * (ray casting; powers filterBounds / zonal joins, G7). */
  def contains(g: Geom, x: Double, y: Double): Boolean = g match {
    case Point(px, py) => px == x && py == y
    case other =>
      Wkb.asPolygons(other).exists { p =>
        pointInRing(x, y, p.shell) && !p.holes.exists(h => pointInRing(x, y, h))
      }
  }

  /** WKB geometry-type word → PostGIS-style name (G8). */
  def geometryType(g: Geom): String = g match {
    case Point(_, _)  => "Point"
    case Poly(_)      => "Polygon"
    case MultiPoly(_) => "MultiPolygon"
  }

  /** Exterior-ring coordinates of every part as [[x,y],...] per ring (G6). */
  def exteriorRings(g: Geom): Array[Array[Array[Double]]] =
    Wkb.asPolygons(g).map { p =>
      val r = p.shell
      Array.tabulate(r.size)(i => Array(r.xs(i), r.ys(i)))
    }

  /** Apply a coordinate transform to every vertex (helper for G2). */
  def mapCoords(g: Geom, f: (Double, Double) => (Double, Double)): Geom = g match {
    case Point(x, y) => val (nx, ny) = f(x, y); Point(nx, ny)
    case Poly(p)     => Poly(mapPoly(p, f))
    case MultiPoly(ps) => MultiPoly(ps.map(mapPoly(_, f)))
  }

  private def mapPoly(p: Polygon, f: (Double, Double) => (Double, Double)): Polygon =
    Polygon(p.rings.map { r =>
      val xs = new Array[Double](r.size)
      val ys = new Array[Double](r.size)
      var i = 0
      while (i < r.size) {
        val (nx, ny) = f(r.xs(i), r.ys(i))
        xs(i) = nx; ys(i) = ny
        i += 1
      }
      Ring(xs, ys)
    })

  private def segsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(px: Double, py: Double, qx: Double, qy: Double,
        rx: Double, ry: Double): Double =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    (o1 * o2 < 0 && o3 * o4 < 0) ||
      (o1 == 0 && math.min(ax, bx) <= cx && cx <= math.max(ax, bx)
        && math.min(ay, by) <= cy && cy <= math.max(ay, by)) ||
      (o2 == 0 && math.min(ax, bx) <= dx && dx <= math.max(ax, bx)
        && math.min(ay, by) <= dy && dy <= math.max(ay, by))
  }

  /** Rectangle-polygon intersection (raster CELLS are boxes, not points —
    * closer to terra::extract coverage semantics than the center test).
    * True iff any polygon vertex lies in the box, any box corner lies in
    * the polygon (hole-aware), or any ring edge crosses a box edge. */
  def intersectsBox(g: Geom, xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): Boolean = g match {
    case Point(x, y) => x >= xmin && x <= xmax && y >= ymin && y <= ymax
    case other =>
      val env = envelope(other)
      if (env.xmax < xmin || env.xmin > xmax || env.ymax < ymin || env.ymin > ymax)
        return false
      // any box corner inside the polygon
      if (contains(other, xmin, ymin) || contains(other, xmax, ymin) ||
          contains(other, xmin, ymax) || contains(other, xmax, ymax)) return true
      val boxEdges = Array(
        (xmin, ymin, xmax, ymin), (xmax, ymin, xmax, ymax),
        (xmax, ymax, xmin, ymax), (xmin, ymax, xmin, ymin))
      Wkb.asPolygons(other).exists { p =>
        p.rings.exists { r =>
          var i = 0
          val n = r.size
          var hit = false
          while (i < n && !hit) {
            val j = (i + 1) % n
            // vertex inside the box
            if (r.xs(i) >= xmin && r.xs(i) <= xmax &&
                r.ys(i) >= ymin && r.ys(i) <= ymax) hit = true
            else {
              var e = 0
              while (e < 4 && !hit) {
                val (ax, ay, bx, by) = boxEdges(e)
                if (segsIntersect(r.xs(i), r.ys(i), r.xs(j), r.ys(j), ax, ay, bx, by))
                  hit = true
                e += 1
              }
            }
            i += 1
          }
          hit
        }
      }
  }

  /** Proper segment crossing: interiors intersect at a single point.
    * Strict orientation signs, so shared endpoints and collinear touching
    * do NOT count — adjacency is not overlap. */
  private def properCross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(px: Double, py: Double, qx: Double, qy: Double,
        rx: Double, ry: Double): Double =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    o1 * o2 < 0 && o3 * o4 < 0
  }

  private def onRing(r: Ring, x: Double, y: Double): Boolean = {
    var i = 0
    val n = r.size
    while (i < n) {
      val j = (i + 1) % n
      val cross = (r.xs(j) - r.xs(i)) * (y - r.ys(i)) - (r.ys(j) - r.ys(i)) * (x - r.xs(i))
      if (cross == 0.0 &&
          x >= math.min(r.xs(i), r.xs(j)) && x <= math.max(r.xs(i), r.xs(j)) &&
          y >= math.min(r.ys(i), r.ys(j)) && y <= math.max(r.ys(i), r.ys(j))) return true
      i += 1
    }
    false
  }

  private def strictlyInside(p: Polygon, x: Double, y: Double): Boolean =
    contains(Poly(p), x, y) && !p.rings.exists(onRing(_, x, y))

  /** Interior-overlap test for two simple polygon parts: true when a shell
    * vertex of one lies strictly inside the other or any shell edges
    * properly cross. Boundary touching (shared edges, shared vertices)
    * is NOT overlap. Best-effort predicate with KNOWN false negatives on
    * fully-degenerate overlaps (collinear boundaries, same-extent side
    * overlaps whose intersections all land on vertices/edges) — since
    * round 3 it is NOT load-bearing: the union path always runs the real
    * dissolve ([[Dissolve]]) on envelope-overlapping components, which
    * handles those cases by area-side classification. */
  def overlaps(a: Polygon, b: Polygon): Boolean = {
    val ea = envelope(Poly(a)); val eb = envelope(Poly(b))
    if (ea.xmax <= eb.xmin || ea.xmin >= eb.xmax ||
        ea.ymax <= eb.ymin || ea.ymin >= eb.ymax) return false
    val sa = a.shell; val sb = b.shell
    var i = 0
    while (i < sa.size) {
      if (strictlyInside(b, sa.xs(i), sa.ys(i))) return true
      i += 1
    }
    i = 0
    while (i < sb.size) {
      if (strictlyInside(a, sb.xs(i), sb.ys(i))) return true
      i += 1
    }
    i = 0
    while (i < sa.size) {
      val i2 = (i + 1) % sa.size
      var j = 0
      while (j < sb.size) {
        val j2 = (j + 1) % sb.size
        if (properCross(sa.xs(i), sa.ys(i), sa.xs(i2), sa.ys(i2),
          sb.xs(j), sb.ys(j), sb.xs(j2), sb.ys(j2))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  /** ST_Union: true geometric dissolve (PostGIS semantics,
    * load_report.py:472). Disjoint-envelope parts pass through untouched;
    * overlapping/adjacent components are merged by the boundary-fragment
    * union ([[Dissolve]]) — overlap areas count once, shared edges vanish,
    * duplicates collapse. */
  def unionCollect(gs: Seq[Geom]): Geom =
    MultiPoly(Dissolve.dissolve(gs.toArray.flatMap(Wkb.asPolygons)))
}
