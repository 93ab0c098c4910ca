package graft.geo

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** Spatial UDF surface (SURVEY.md §2.7 G1–G9) over WKB BinaryType columns.
  *
  * Scalar UDFs here are deliberately simple Scala closures: they sit
  * outside whole-stage codegen, but every plan keeps them on the *select*
  * side of joins/aggregations, with pure-column bbox prefilters doing the
  * data reduction (see ops.Spatial) — so the non-codegen region stays
  * proportional to surviving rows, not scanned rows. */
object GeoFunctions {

  /** st_area: planar area in coordinate units² (G3). */
  val stArea = udf((wkb: Array[Byte]) => Geo.area(Wkb.parse(wkb)))

  /** st_transform: reproject every vertex between supported SRIDs (G2). */
  val stTransform = udf((wkb: Array[Byte], from: Int, to: Int) =>
    Wkb.write(Geo.mapCoords(Wkb.parse(wkb), Crs.transform(from, to))))

  /** st_centroid → [x, y] (G4). */
  val stCentroid = udf((wkb: Array[Byte]) => {
    val (x, y) = Geo.centroid(Wkb.parse(wkb)); Array(x, y)
  })

  /** st_envelope → (xmin, ymin, xmax, ymax) struct (G5/A10). */
  val stEnvelope = udf((wkb: Array[Byte]) => {
    val e = Geo.envelope(Wkb.parse(wkb)); (e.xmin, e.ymin, e.xmax, e.ymax)
  })

  /** st_contains_point(geom, x, y) (G7 point-in-polygon). */
  val stContainsPoint = udf((wkb: Array[Byte], x: Double, y: Double) =>
    Geo.contains(Wkb.parse(wkb), x, y))

  /** st_geometry_type (G8). */
  val stGeometryType = udf((wkb: Array[Byte]) => Geo.geometryType(Wkb.parse(wkb)))

  /** st_exterior_rings → array of rings, each array of [x,y] (G6). */
  val stExteriorRings = udf((wkb: Array[Byte]) => Geo.exteriorRings(Wkb.parse(wkb)))

  /** st_num_parts: polygon part count. */
  val stNumParts = udf((wkb: Array[Byte]) => Wkb.asPolygons(Wkb.parse(wkb)).length)

  /** Fixture/builder helper: axis-aligned rectangle polygon as WKB. */
  val stMakeBox = udf((xmin: Double, ymin: Double, xmax: Double, ymax: Double) =>
    Wkb.write(Wkb.Poly(Wkb.Polygon(Array(Wkb.Ring(
      Array(xmin, xmax, xmax, xmin, xmin),
      Array(ymin, ymin, ymax, ymax, ymin)))))))

  /** Fixture/builder helper: triangle polygon as WKB (CCW ring) — gives
    * the oracle twins a NON-axis-aligned shape, so ray-cast containment
    * and the shoelace kernels are exercised on slanted edges, not just
    * the rectangle special case. */
  val stMakeTriangle =
    udf((ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double) =>
      Wkb.write(Wkb.Poly(Wkb.Polygon(Array(Wkb.Ring(
        Array(ax, bx, cx, ax),
        Array(ay, by, cy, ay)))))))

  /** G1 ST_Union as a typed Aggregator: a TRUE geometric dissolve (PostGIS
    * ST_Union semantics, load_report.py:472). Parts with disjoint
    * envelopes pass through untouched; overlapping/adjacent components go
    * through the boundary-fragment union ([[Dissolve]]) so overlap areas
    * count once, shared edges vanish, and duplicated geometry collapses —
    * the round-2 throw-on-overlap guard is replaced by the real
    * computation. Buffer is the accumulated part list — merge is
    * associative, and finish sorts parts canonically so the result is
    * invariant to partitioning/merge order. */
  private val unionAgg = new Aggregator[Array[Byte], List[Array[Byte]], Array[Byte]] {
    def zero: List[Array[Byte]] = Nil
    def reduce(b: List[Array[Byte]], a: Array[Byte]): List[Array[Byte]] = a :: b
    def merge(b1: List[Array[Byte]], b2: List[Array[Byte]]): List[Array[Byte]] = b1 ::: b2
    def finish(b: List[Array[Byte]]): Array[Byte] = {
      val sorted = b.sortWith { (l, r) =>
        java.util.Arrays.compareUnsigned(l, r) < 0
      }
      val parts = sorted.flatMap(bs => Wkb.asPolygons(Wkb.parse(bs))).toArray
      Wkb.write(Wkb.MultiPoly(Dissolve.dissolve(parts)))
    }
    def bufferEncoder: Encoder[List[Array[Byte]]] = Encoders.kryo[List[Array[Byte]]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  val stUnionCollect: Column => Column =
    org.apache.spark.sql.functions.udaf(unionAgg).apply(_)

  /** Register everything for spark.sql use. The functions with native
    * Catalyst twins (st_contains_point, st_area_native, st_intersects_box)
    * register via GeoExpressions so the null-safe codegen expressions are
    * never shadowed by the UDF closures. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_area", stArea)
    spark.udf.register("st_transform", stTransform)
    spark.udf.register("st_centroid", stCentroid)
    spark.udf.register("st_envelope", stEnvelope)
    spark.udf.register("st_geometry_type", stGeometryType)
    spark.udf.register("st_exterior_rings", stExteriorRings)
    spark.udf.register("st_num_parts", stNumParts)
    spark.udf.register("st_make_box", stMakeBox)
    spark.udf.register("st_union_collect",
      org.apache.spark.sql.functions.udaf(unionAgg))
    GeoExpressions.ensureRegistered(spark)
  }
}
