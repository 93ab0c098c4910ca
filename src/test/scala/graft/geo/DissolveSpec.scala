package graft.geo

import graft.geo.Wkb.{Polygon, Ring}
import org.scalatest.funsuite.AnyFunSuite

/** True-dissolve kernel: PostGIS ST_Union semantics including every
  * degenerate case the round-2 overlap guard could not see (shared-edge
  * rectangles with no strictly-interior vertex, rotated duplicates,
  * vertex-on-edge touches). */
class DissolveSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Array(Ring(Array(x0, x1, x1, x0, x0), Array(y0, y0, y1, y1, y0))))

  private def poly(pts: (Double, Double)*): Polygon =
    Polygon(Array(Ring(pts.map(_._1).toArray :+ pts.head._1,
      pts.map(_._2).toArray :+ pts.head._2)))

  private def area(ps: Array[Polygon]): Double =
    ps.map(p => Geo.polygonArea(p)).sum

  test("overlapping rectangles: merged area = inclusion-exclusion") {
    val u = Dissolve.dissolve(Array(rect(0, 0, 2, 2), rect(1, 1, 3, 3)))
    assert(u.length === 1)
    assert(math.abs(area(u) - 7.0) < 1e-9) // 4 + 4 - 1
  }

  test("ADVICE case: same-extent side-overlap with vertex-on-edge only") {
    // [0,2]x[0,1] ∪ [1,3]x[0,1]: every boundary intersection lands on a
    // vertex/edge, no strictly-interior vertex, no proper crossing — the
    // round-2 guard passed this silently; the dissolve must compute 3.0
    val u = Dissolve.dissolve(Array(rect(0, 0, 2, 1), rect(1, 0, 3, 1)))
    assert(u.length === 1)
    assert(math.abs(area(u) - 3.0) < 1e-9)
  }

  test("exact and rotated-vertex-order duplicates collapse") {
    val a = rect(0, 0, 2, 2)
    // same square, ring starting at a different vertex
    val rot = poly((2, 0), (2, 2), (0, 2), (0, 0))
    val u = Dissolve.dissolve(Array(a, rot))
    assert(math.abs(area(u) - 4.0) < 1e-9)
  }

  test("adjacent rectangles merge across the shared edge") {
    val u = Dissolve.dissolve(Array(rect(-1, -1, 1, 1), rect(1, -1, 3, 1)))
    assert(u.length === 1)
    assert(math.abs(area(u) - 8.0) < 1e-9)
    // the shared edge is gone: merged shell has no vertex strictly inside
    assert(u.head.rings.length === 1)
  }

  test("containment: contained part vanishes") {
    val u = Dissolve.dissolve(Array(rect(-2, -2, 2, 2), rect(-1, -1, 1, 1)))
    assert(u.length === 1)
    assert(math.abs(area(u) - 16.0) < 1e-9)
  }

  test("union can create a hole (U-shape capped)") {
    // U: [0,3]x[0,3] minus the open notch [1,2]x[1,3]; cap [0,3]x[3,4]
    val uShape = poly((0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3))
    val cap = rect(0, 3, 3, 4)
    val u = Dissolve.dissolve(Array(uShape, cap))
    assert(u.length === 1)
    assert(u.head.rings.length === 2, "expected shell + hole")
    assert(math.abs(area(u) - 10.0) < 1e-9) // 3*4 outer − 1*2 hole
  }

  test("point-touching squares stay two clean parts") {
    val u = Dissolve.dissolve(Array(rect(-1, -1, 0, 0), rect(0, 0, 1, 1)))
    assert(u.length === 2)
    assert(math.abs(area(u) - 2.0) < 1e-9)
  }

  test("overlapping envelopes but disjoint geometries pass through") {
    // L-shape with a disjoint box inside its envelope notch
    val l = poly((0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3))
    val b = rect(2, 2, 3, 3)
    val u = Dissolve.dissolve(Array(l, b))
    assert(u.length === 2)
    assert(math.abs(area(u) - 6.0) < 1e-9) // 5 + 1
  }

  test("disjoint-envelope parts are passed through byte-identically") {
    val a = rect(0, 0, 1, 1); val b = rect(10, 10, 11, 11)
    val u = Dissolve.dissolve(Array(a, b))
    assert(u.length === 2)
    assert(u(0) eq a); assert(u(1) eq b) // no geometry rebuild
  }

  test("property: random overlapping boxes match scanline union area") {
    // independent reference: exact union area of axis-aligned boxes via
    // x-sweep + y-interval merge (no shared code with Dissolve)
    def scanlineArea(boxes: Seq[(Double, Double, Double, Double)]): Double = {
      val xs = boxes.flatMap(b => Seq(b._1, b._3)).distinct.sorted
      xs.sliding(2).map {
        case Seq(x0, x1) =>
          val mid = (x0 + x1) / 2
          val ys = boxes.filter(b => b._1 <= mid && mid < b._3)
            .map(b => (b._2, b._4)).sortBy(_._1)
          var covered = 0.0
          var curLo = Double.NaN; var curHi = Double.NegativeInfinity
          ys.foreach { case (lo, hi) =>
            if (curHi < lo) { // disjoint: flush
              if (!curLo.isNaN) covered += curHi - curLo
              curLo = lo; curHi = hi
            } else if (hi > curHi) curHi = hi
          }
          if (!curLo.isNaN) covered += curHi - curLo
          covered * (x1 - x0)
        case _ => 0.0
      }.sum
    }
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 25) {
      val n = 2 + rnd.nextInt(7)
      val boxes = Seq.fill(n) {
        val x0 = rnd.nextInt(30).toDouble; val y0 = rnd.nextInt(30).toDouble
        // integer coords on purpose: maximally degenerate (shared edges,
        // equal corners, collinear boundaries everywhere)
        (x0, y0, x0 + 1 + rnd.nextInt(12), y0 + 1 + rnd.nextInt(12))
      }
      val parts = boxes.map { case (x0, y0, x1, y1) => rect(x0, y0, x1, y1) }
      val expect = scanlineArea(boxes)
      val got = area(Dissolve.dissolve(parts.toArray))
      assert(math.abs(got - expect) < 1e-6,
        s"trial $trial: dissolve=$got scanline=$expect boxes=$boxes")
    }
  }

  test("property: rotated overlapping squares match Monte-Carlo union area") {
    // general (non-axis-aligned) polygons: proper edge crossings at
    // arbitrary angles; reference = deterministic-grid point sampling
    val rnd = new scala.util.Random(42)
    def rotSquare(cx: Double, cy: Double, half: Double, theta: Double): Polygon = {
      val (c, s) = (math.cos(theta), math.sin(theta))
      val pts = Seq((-half, -half), (half, -half), (half, half), (-half, half))
        .map { case (x, y) => (cx + x * c - y * s, cy + x * s + y * c) }
      poly(pts: _*)
    }
    for (trial <- 1 to 10) {
      val parts = Array.tabulate(3) { i =>
        rotSquare(5 + rnd.nextDouble() * 4, 5 + rnd.nextDouble() * 4,
          1.5 + rnd.nextDouble() * 2, rnd.nextDouble() * math.Pi / 2)
      }
      val got = area(Dissolve.dissolve(parts))
      // 400×400 grid over the bounding frame [0,16]²
      val n = 400
      var hits = 0
      for (ix <- 0 until n; iy <- 0 until n) {
        val x = ix * 16.0 / n + 0.02; val y = iy * 16.0 / n + 0.02
        if (parts.exists(p => Geo.contains(Wkb.Poly(p), x, y))) hits += 1
      }
      val mc = hits * (16.0 * 16.0) / (n.toLong * n)
      assert(math.abs(got - mc) < 0.05 * math.max(mc, 1.0),
        s"trial $trial: dissolve=$got sampled=$mc")
      // union never exceeds the sum of parts, never undercuts the max part
      val partAreas = parts.map(p => Geo.polygonArea(p))
      assert(got <= partAreas.sum + 1e-9 && got >= partAreas.max - 1e-9)
    }
  }

  test("many-way overlap chain dissolves to one part with exact area") {
    // 5 unit squares stepping by 0.5: union = 0.5*4 + 1 = 3 by 1 high
    val parts = Array.tabulate(5)(i => rect(i * 0.5, 0, i * 0.5 + 1, 1))
    val u = Dissolve.dissolve(parts)
    assert(u.length === 1)
    assert(math.abs(area(u) - 3.0) < 1e-9)
  }
}
