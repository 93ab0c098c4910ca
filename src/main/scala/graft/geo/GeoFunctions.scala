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

  /** G1 ST_Union as a typed Aggregator: collect parts into one
    * MultiPolygon (union-as-collect; SURVEY.md §7.4 documents why this is
    * observationally equivalent for the reference's non-overlapping
    * parcels). Buffer is the accumulated part list — merge is associative
    * and order-stable per sort order, so results are deterministic after
    * an upstream sort or on sorted keys. */
  private val unionAgg = new Aggregator[Array[Byte], List[Array[Byte]], Array[Byte]] {
    def zero: List[Array[Byte]] = Nil
    def reduce(b: List[Array[Byte]], a: Array[Byte]): List[Array[Byte]] = a :: b
    def merge(b1: List[Array[Byte]], b2: List[Array[Byte]]): List[Array[Byte]] = b1 ::: b2
    def finish(b: List[Array[Byte]]): Array[Byte] = {
      // canonical order: sort parts by their WKB bytes so the result is
      // invariant to partitioning/merge order
      val sorted = b.sortWith { (l, r) =>
        java.util.Arrays.compareUnsigned(l, r) < 0
      }
      // union-as-collect is only area/NDVI-equivalent to a true dissolve
      // when inputs are disjoint — fail LOUDLY instead of double-counting.
      // Byte-identical duplicates are adjacent after the sort; interior
      // overlaps are caught by the pairwise kernel test (envelope-
      // prefiltered; boundary adjacency is fine).
      var dup = sorted
      while (dup.nonEmpty && dup.tail.nonEmpty) {
        if (java.util.Arrays.equals(dup.head, dup.tail.head))
          throw new IllegalStateException(
            "st_union_collect: duplicate geometry in union group — " +
              "union-as-collect would double-count its area")
        dup = dup.tail
      }
      val parts = sorted.flatMap(bs => Wkb.asPolygons(Wkb.parse(bs))).toArray
      var i = 0
      while (i < parts.length) {
        var j = i + 1
        while (j < parts.length) {
          if (Geo.overlaps(parts(i), parts(j)))
            throw new IllegalStateException(
              s"st_union_collect: overlapping parts ($i, $j) in union group — " +
                "union-as-collect would double-count the intersection area")
          j += 1
        }
        i += 1
      }
      Wkb.write(Wkb.MultiPoly(parts))
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
