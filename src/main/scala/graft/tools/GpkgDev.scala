package graft.tools

/** Dev-only: exercise the GPKG writer end-to-end (kept with the other
  * tools mains; see Scratch/TimeParts/Plans). */
object GpkgDev {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[4]", 4)
    val parcels = graft.ops.Spatial.parcels(spark, "/root/testdata/sf0.001")
    graft.sources.Gpkg.writeLayer(parcels, "/tmp/test_out.gpkg", "parcels")
    println("[gpkgdev] wrote /tmp/test_out.gpkg")
    val back = graft.sources.Gpkg.readLayer(spark, "/tmp/test_out.gpkg", "parcels")
    println("[gpkgdev] reread rows=" + back.count())
    back.show(3, 60)
    spark.stop()
  }
}
