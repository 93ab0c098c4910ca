package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dev-only: dump the ENGINE's transformed parcel ring coordinates as
  * CSV (full hex-precision via Double.toString) for the cross-engine
  * corner-drift measurement behind the q43/q44/q45 oracle margin claim.
  * Usage: tools/run.sh graft.tools.CornerDump <sfDir> <outCsv> */
object CornerDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val s = Sessions.build("local[8]", 8)
    graft.geo.GeoExpressions.ensureRegistered(s)
    val rows = ops.Spatial.parcels(s, dir)
      .select(col("id"), graft.geo.GeoFunctions.stTransform(col("geom"),
        col("geom_srid"), lit(graft.geo.Crs.WGS84)).as("g"))
      .select(col("id"),
        explode(graft.geo.GeoFunctions.stExteriorRings(col("g"))).as("r"))
      .select(col("id"), posexplode(col("r")).as(Seq("i", "pt")))
      .select(col("id"), col("i"), col("pt")(0).as("lon"), col("pt")(1).as("lat"))
      .orderBy(col("id"), col("i"))
      .collect()
    val w = new java.io.PrintWriter(out)
    try rows.foreach(r => w.println(
      s"${r.getLong(0)},${r.getInt(1)},${r.getDouble(2)},${r.getDouble(3)}"))
    finally w.close()
    println(s"[cornerdump] ${rows.length} ring points -> $out")
    s.stop()
  }
}
