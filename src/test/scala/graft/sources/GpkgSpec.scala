package graft.sources

import graft.Sessions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reads the REFERENCE's own lu.gpkg and asserts its published goldens
  * (results/summary_report.csv) — SURVEY.md §5 items 2 and 5. */
class GpkgSpec extends AnyFunSuite {

  private lazy val spark = Sessions.build("local[4]", 4)
  private val path = "/root/reference/data/lu.gpkg"

  test("sqlite reader: schema lists the lu layer") {
    val db = Sqlite.open(path)
    val names = db.tables.map(_.name)
    assert(names.contains("lu") && names.contains("gpkg_geometry_columns"))
    assert(db.columnNames(db.tables.find(_.name == "lu").get)
      .take(2) === Seq("fid", "geom"))
  }

  test("lu layer: 31 features, 17 distinct KETERANGAN, srid 100000") {
    val lu = Gpkg.readLayer(spark, path, "lu")
    assert(lu.count() === 31)
    assert(lu.select("KETERANGAN").distinct().count() === 17)
    assert(lu.select("geom_srid").distinct().collect().map(_.getInt(0)).toSeq === Seq(100000))
  }

  test("golden: mangrove filter selects exactly 'Mangrove Sungai Sanrumukti'") {
    val lu = Gpkg.readLayer(spark, path, "lu")
    val m = lu.filter(graft.ops.Relational.asciiLower(col("KETERANGAN")).contains("mangrove"))
      .select("KETERANGAN").distinct().collect().map(_.getString(0))
    assert(m.toSeq === Seq("Mangrove Sungai Sanrumukti"))
  }

  test("golden: total mangrove area = 4.16 ha (Web-Mercator, summary_report.csv:2)") {
    val rows = graft.SparkEntry.queries("q49_gpkg_golden_area")(spark, "unused").collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(1) === 4.16)
  }
}
