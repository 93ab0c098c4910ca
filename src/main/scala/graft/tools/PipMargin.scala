package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dev-only audit backing the q43/q44/q45 direct oracles' margin claim
  * (scaladoc on Spatial.scenesParcelJoinSql): the oracle replays the
  * engine's ray-cast PIP as half-plane sign tests over TM-inverse-
  * transformed parcel corners, so the only cross-engine divergence is
  * libm corner drift (~1e-13°). A boundary flip needs a scene cell
  * center within that distance of a parcel edge LINE. This tool
  * measures the actual minimum point-to-edge-line distance (degrees)
  * over every candidate pair near a parcel (bucket join, parcel bbox
  * padded by one bucket — a superset of the oracle's padded-bbox
  * candidates).
  *
  * Usage: tools/run.sh graft.tools.PipMargin <sfDir>
  */
object PipMargin {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = Sessions.build(s"local[$cpus]", cpus.toInt)
    graft.geo.GeoExpressions.ensureRegistered(s)
    val b = 0.002
    val cells = ops.Spatial.scenes(s, dir)
      .select(col("cell_lon").as("px"), col("cell_lat").as("py")).distinct()
      .withColumn("cbx", floor(col("px") / b).cast("long"))
      .withColumn("cby", floor(col("py") / b).cast("long"))
    val ring = ops.Spatial.parcels(s, dir)
      .select(col("id"), graft.geo.GeoFunctions.stTransform(col("geom"),
        col("geom_srid"), lit(graft.geo.Crs.WGS84)).as("g"))
      .select(col("id"),
        explode(graft.geo.GeoFunctions.stExteriorRings(col("g"))).as("r"))
    val edges = ring
      .withColumn("xmn", expr("array_min(transform(r, p -> p[0]))"))
      .withColumn("xmx", expr("array_max(transform(r, p -> p[0]))"))
      .withColumn("ymn", expr("array_min(transform(r, p -> p[1]))"))
      .withColumn("ymx", expr("array_max(transform(r, p -> p[1]))"))
      .select(col("id"), col("xmn"), col("xmx"), col("ymn"), col("ymx"),
        posexplode(col("r")).as(Seq("i", "pt")))
      .withColumn("nxt", lead(col("pt"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("i"))))
      .filter(col("nxt").isNotNull)
      .select(col("id"),
        col("pt")(0).as("ax"), col("pt")(1).as("ay"),
        col("nxt")(0).as("bx"), col("nxt")(1).as("by"),
        col("xmn"), col("xmx"), col("ymn"), col("ymx"))
      .withColumn("ebx", explode(sequence(
        floor((col("xmn") - b) / b).cast("long"),
        floor((col("xmx") + b) / b).cast("long"))))
      .withColumn("eby", explode(sequence(
        floor((col("ymn") - b) / b).cast("long"),
        floor((col("ymx") + b) / b).cast("long"))))
    val d = cells.join(edges,
        col("cbx") === col("ebx") && col("cby") === col("eby"))
      .withColumn("cross",
        (col("bx") - col("ax")) * (col("py") - col("ay"))
          - (col("by") - col("ay")) * (col("px") - col("ax")))
      .withColumn("len", hypot(col("bx") - col("ax"), col("by") - col("ay")))
      .withColumn("dist", abs(col("cross")) / col("len"))
      .agg(min(col("dist")).as("min_edge_dist_deg"),
        count(lit(1)).as("pairs_audited"))
      .head()
    println(s"[pipmargin] $dir min_edge_dist_deg=${d.getDouble(0)} pairs=${d.getLong(1)}")
    s.stop()
  }
}
