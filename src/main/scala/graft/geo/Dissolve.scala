package graft.geo

import graft.geo.Wkb.{Polygon, Ring}
import scala.collection.mutable

/** True geometric dissolve (PostGIS `ST_Union` semantics,
  * load_report.py:472) for possibly-overlapping polygon parts, built on
  * the repo's own planar kernel — no JTS in the offline jar set.
  *
  * Algorithm: boundary-fragment classification.
  *   1. every ring edge of every part is split at its intersections with
  *      every other edge (proper crossings, vertex-on-edge touches, and
  *      collinear overlaps all just produce split points);
  *   2. a fragment lies on the union boundary iff exactly ONE side of its
  *      midpoint is inside the union (point-in-any-part, holes honored) —
  *      shared edges between adjacent parts and interior fragments have
  *      both sides inside and drop out; duplicated geometry collapses via
  *      same-direction fragment dedup;
  *   3. boundary fragments are oriented interior-on-left and chained into
  *      rings with the leftmost-turn rule (correct at pinch vertices);
  *   4. positive-area rings are shells, negative-area rings are holes,
  *      assigned to the smallest enclosing shell.
  *
  * Classification by side-of-boundary area tests (rather than by
  * intersection topology à la Weiler–Atherton/Greiner–Hormann) is what
  * makes the degenerate cases — shared edges, vertex-on-edge touches,
  * exact duplicates, rotated duplicates — fall out correctly instead of
  * needing special-case handling.
  *
  * Numerics: nudge/snap tolerances scale with the input envelope
  * (1e-9·scale); features smaller than that are below the kernel's
  * resolution (documented limitation, far below any real parcel size).
  */
object Dissolve {

  private final case class Frag(x1: Double, y1: Double, x2: Double, y2: Double)

  /** ST_Union of polygon parts: group into envelope-overlap connected
    * components (union-find), pass disjoint-envelope parts through
    * untouched (the common case — no geometry rebuilt, no FP perturbation)
    * and run the fragment union per overlapping component. */
  def dissolve(parts: Array[Polygon]): Array[Polygon] = {
    if (parts.length <= 1) return parts
    val envs = parts.map(p => Geo.envelope(Wkb.Poly(p)))
    val parent = Array.tabulate(parts.length)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      parent(i) = r; r
    }
    var i = 0
    while (i < parts.length) {
      var j = i + 1
      while (j < parts.length) {
        if (!(envs(i).xmax < envs(j).xmin || envs(i).xmin > envs(j).xmax ||
              envs(i).ymax < envs(j).ymin || envs(i).ymin > envs(j).ymax)) {
          val a = find(i); val b = find(j)
          if (a != b) parent(math.max(a, b)) = math.min(a, b)
        }
        j += 1
      }
      i += 1
    }
    parts.indices.groupBy(find).toSeq.sortBy(_._1).iterator.flatMap { case (_, idxs) =>
      val comp = idxs.map(parts).toArray
      if (comp.length == 1) comp else union(comp)
    }.toArray
  }

  /** Dissolve parts into a disjoint set of polygons covering their union. */
  def union(parts: Array[Polygon]): Array[Polygon] = {
    if (parts.length <= 1) return parts

    // scale-relative tolerances
    var xmin = Double.PositiveInfinity; var xmax = Double.NegativeInfinity
    var ymin = Double.PositiveInfinity; var ymax = Double.NegativeInfinity
    parts.foreach(_.rings.foreach { r =>
      var i = 0
      while (i < r.size) {
        if (r.xs(i) < xmin) xmin = r.xs(i); if (r.xs(i) > xmax) xmax = r.xs(i)
        if (r.ys(i) < ymin) ymin = r.ys(i); if (r.ys(i) > ymax) ymax = r.ys(i)
        i += 1
      }
    })
    val scale = math.max(math.max(xmax - xmin, ymax - ymin), 1e-12)
    val eps = scale * 1e-9

    // ---- 1. collect edges, split at all pairwise intersections ----------
    final case class Edge(x1: Double, y1: Double, x2: Double, y2: Double) {
      val exmin = math.min(x1, x2) - eps; val exmax = math.max(x1, x2) + eps
      val eymin = math.min(y1, y2) - eps; val eymax = math.max(y1, y2) + eps
      val splits = mutable.ArrayBuffer.empty[(Double, Double, Double)] // (t, x, y)
    }
    val edges = mutable.ArrayBuffer.empty[Edge]
    parts.foreach(_.rings.foreach { r =>
      var i = 0
      val n = r.size
      while (i < n) {
        val j = (i + 1) % n
        if (math.abs(r.xs(i) - r.xs(j)) > 0 || math.abs(r.ys(i) - r.ys(j)) > 0)
          edges += Edge(r.xs(i), r.ys(i), r.xs(j), r.ys(j))
        i += 1
      }
    })

    def paramOn(e: Edge, x: Double, y: Double): Double = {
      val dx = e.x2 - e.x1; val dy = e.y2 - e.y1
      if (math.abs(dx) >= math.abs(dy)) (x - e.x1) / dx else (y - e.y1) / dy
    }
    def addSplit(e: Edge, x: Double, y: Double): Unit = {
      val t = paramOn(e, x, y)
      if (t > 1e-12 && t < 1 - 1e-12) e.splits += ((t, x, y))
    }

    var a = 0
    while (a < edges.length) {
      val ea = edges(a)
      var b = a + 1
      while (b < edges.length) {
        val eb = edges(b)
        if (ea.exmin <= eb.exmax && ea.exmax >= eb.exmin &&
            ea.eymin <= eb.eymax && ea.eymax >= eb.eymin) {
          val d1x = ea.x2 - ea.x1; val d1y = ea.y2 - ea.y1
          val d2x = eb.x2 - eb.x1; val d2y = eb.y2 - eb.y1
          val denom = d1x * d2y - d1y * d2x
          val qpx = eb.x1 - ea.x1; val qpy = eb.y1 - ea.y1
          if (math.abs(denom) > eps * eps) {
            // single intersection point of the support lines
            val t = (qpx * d2y - qpy * d2x) / denom
            val u = (qpx * d1y - qpy * d1x) / denom
            if (t >= -1e-12 && t <= 1 + 1e-12 && u >= -1e-12 && u <= 1 + 1e-12) {
              // ONE shared computed point for both edges → chaining keys match
              val ix = ea.x1 + t * d1x; val iy = ea.y1 + t * d1y
              addSplit(ea, ix, iy); addSplit(eb, ix, iy)
            }
          } else if (math.abs(qpx * d1y - qpy * d1x) <= eps * scale) {
            // collinear: split each at the other's endpoints
            addSplit(ea, eb.x1, eb.y1); addSplit(ea, eb.x2, eb.y2)
            addSplit(eb, ea.x1, ea.y1); addSplit(eb, ea.x2, ea.y2)
          }
        }
        b += 1
      }
      a += 1
    }

    val frags = mutable.ArrayBuffer.empty[Frag]
    edges.foreach { e =>
      val pts = ((0.0, e.x1, e.y1) +: e.splits.sortBy(_._1)) :+ ((1.0, e.x2, e.y2))
      var i = 0
      while (i + 1 < pts.length) {
        val (_, ax, ay) = pts(i); val (_, bx, by) = pts(i + 1)
        if (math.abs(ax - bx) > eps || math.abs(ay - by) > eps)
          frags += Frag(ax, ay, bx, by)
        i += 1
      }
    }

    // ---- 2. classify: union boundary iff exactly one side is inside -----
    def insideUnion(x: Double, y: Double): Boolean = {
      var i = 0
      while (i < parts.length) {
        val p = parts(i)
        if (Geo.contains(Wkb.Poly(p), x, y)) return true
        i += 1
      }
      false
    }
    val boundary = mutable.ArrayBuffer.empty[Frag]
    frags.foreach { f =>
      val mx = (f.x1 + f.x2) / 2; val my = (f.y1 + f.y2) / 2
      val dx = f.x2 - f.x1; val dy = f.y2 - f.y1
      val len = math.sqrt(dx * dx + dy * dy)
      val nx = -dy / len; val ny = dx / len // left normal
      val inL = insideUnion(mx + nx * eps, my + ny * eps)
      val inR = insideUnion(mx - nx * eps, my - ny * eps)
      if (inL != inR) {
        // orient interior-on-left
        boundary += (if (inL) f else Frag(f.x2, f.y2, f.x1, f.y1))
      }
    }

    // same-direction dedup (duplicated input geometry yields repeated
    // boundary fragments; keep one)
    def key(x: Double, y: Double): (Long, Long) =
      (math.round(x / eps / 4), math.round(y / eps / 4))
    val seen = mutable.HashSet.empty[((Long, Long), (Long, Long))]
    val uniq = boundary.filter { f =>
      seen.add((key(f.x1, f.y1), key(f.x2, f.y2)))
    }

    // ---- 3. chain into rings with the leftmost-turn rule -----------------
    val out = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[Frag]]
    uniq.foreach(f => out.getOrElseUpdate(key(f.x1, f.y1), mutable.ArrayBuffer.empty) += f)
    val used = mutable.HashSet.empty[Frag]
    val rings = mutable.ArrayBuffer.empty[Array[(Double, Double)]]
    uniq.foreach { start =>
      if (!used(start)) {
        val pts = mutable.ArrayBuffer[(Double, Double)]((start.x1, start.y1))
        var cur = start
        var closed = false
        var ok = false
        var steps = 0
        while (!closed && steps <= uniq.length) {
          used += cur
          pts += ((cur.x2, cur.y2))
          if (key(cur.x2, cur.y2) == key(start.x1, start.y1)) { closed = true; ok = true }
          else {
            val cands = out.getOrElse(key(cur.x2, cur.y2), mutable.ArrayBuffer.empty)
              .filterNot(used)
            if (cands.isEmpty) { closed = true; pts.clear() } // open chain: drop
            else {
              val inDx = cur.x2 - cur.x1; val inDy = cur.y2 - cur.y1
              // face-on-left continuation: the first arm CLOCKWISE from the
              // reversed incoming direction. In CCW-turn terms (δ ∈ (0,2π)
              // from the incoming direction): the largest δ ≤ π if any,
              // else the largest δ. Correct at pinch vertices where two
              // shells touch at a point.
              def delta(c: Frag): Double = {
                val ox = c.x2 - c.x1; val oy = c.y2 - c.y1
                val th = math.atan2(inDx * oy - inDy * ox, inDx * ox + inDy * oy)
                if (th <= 0) th + 2 * math.Pi else th
              }
              val leftish = cands.filter(delta(_) <= math.Pi + 1e-12)
              cur = (if (leftish.nonEmpty) leftish else cands).maxBy(delta)
            }
          }
          steps += 1
        }
        if (ok && pts.length >= 4) {
          pts(pts.length - 1) = pts(0) // snap the closing vertex exactly
          rings += pts.toArray
        }
      }
    }

    // ---- 4. shells vs holes, hole assignment -----------------------------
    def signedArea(ps: Array[(Double, Double)]): Double = {
      var s = 0.0
      var i = 0
      val n = ps.length - 1 // closed: last == first (by key)
      while (i < n) {
        val j = (i + 1) % n
        s += ps(i)._1 * ps(j)._2 - ps(j)._1 * ps(i)._2
        i += 1
      }
      s / 2
    }
    def toRing(ps: Array[(Double, Double)]): Ring = {
      val n = ps.length
      Ring(Array.tabulate(n)(i => ps(i)._1), Array.tabulate(n)(i => ps(i)._2))
    }
    val areaEps = eps * scale
    val shells = mutable.ArrayBuffer.empty[(Ring, Double)]
    val holes = mutable.ArrayBuffer.empty[(Ring, Double, Double)] // ring, qx, qy
    rings.foreach { ps =>
      val sa = signedArea(ps)
      if (sa > areaEps) shells += ((toRing(ps), sa))
      else if (sa < -areaEps) {
        // representative point strictly inside the hole: midpoint of the
        // first edge nudged RIGHT of the (interior-left) boundary
        val (x1, y1) = ps(0); val (x2, y2) = ps(1)
        val dx = x2 - x1; val dy = y2 - y1
        val len = math.sqrt(dx * dx + dy * dy)
        holes += ((toRing(ps), (x1 + x2) / 2 + dy / len * eps,
          (y1 + y2) / 2 - dx / len * eps))
      }
    }
    val byShell = Array.fill(shells.length)(mutable.ArrayBuffer.empty[Ring])
    holes.foreach { case (h, qx, qy) =>
      val enclosing = shells.zipWithIndex
        .filter { case ((s, _), _) => Geo.pointInRing(qx, qy, s) }
      if (enclosing.nonEmpty)
        byShell(enclosing.minBy(_._1._2)._2) += h
    }
    shells.zipWithIndex.map { case ((s, _), i) =>
      Polygon((s +: byShell(i)).toArray)
    }.toArray
  }
}
