package graft.sources

import graft.Q
import graft.geo.{Crs, Wkb, GeoFunctions => G}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoPackage layer scan (S1, SURVEY.md §2.1): GPKG = SQLite + a geometry
  * blob convention ('GP' header + envelope + WKB). Reads via the
  * dependency-free [[Sqlite]] reader, strips the blob header
  * (Wkb.fromGpkg), and validates CRS presence — the reference's loader
  * fails fast on a missing CRS (load_data.py:51-57).
  *
  * The file parse is driver-side (a GPKG is a small config-like artifact —
  * the reference's is 320 KB); the resulting DataFrame is distributed.
  * For big vector data, convert once to Parquet and read that. */
object Gpkg {

  /** Load one layer: geometry columns become (wkb BinaryType, srid Int). */
  def readLayer(spark: SparkSession, path: String, layer: String): DataFrame = {
    val db = Sqlite.open(path)
    val table = db.tables.find(_.name == layer)
      .getOrElse(throw new NoSuchElementException(s"layer $layer"))
    val cols = db.columnNames(table)
    // geometry column name from gpkg_geometry_columns
    val geomCols = db.rows("gpkg_geometry_columns")
      .filter(_._2(0) == layer)
      .map(r => (r._2(1).asInstanceOf[String], r._2(3).asInstanceOf[Long].toInt))
      .toMap
    val pkIdx = db.rowidAliasIndex(table)
    val rows = db.rows(layer).map { case (rowid, vals) =>
      val out = new Array[Any](cols.length + geomCols.size)
      var extra = cols.length
      cols.indices.foreach { i =>
        val v = vals(i)
        if (geomCols.contains(cols(i))) {
          if (v == null) {
            out(i) = null; out(extra) = null
          } else {
            val (srid, wkb) = Wkb.fromGpkg(v.asInstanceOf[Array[Byte]])
            require(srid != 0, s"layer $layer: feature $rowid has no CRS (srid=0)")
            out(i) = wkb
            out(extra) = srid
          }
          extra += 1
        } else {
          // INTEGER PRIMARY KEY is stored null in the record → rowid
          // (at its declared position, not necessarily column 0)
          out(i) = if (v == null && i == pkIdx) rowid else v
        }
      }
      Row.fromSeq(out.toIndexedSeq)
    }
    val fields = cols.map { c =>
      if (geomCols.contains(c)) StructField(c, BinaryType)
      else StructField(c, inferType(rows, cols.indexOf(c)))
    } ++ geomCols.keys.map(c => StructField(s"${c}_srid", IntegerType))
    val coerced = rows.map { r =>
      Row.fromSeq(r.toSeq.zipWithIndex.map {
        case (v: Long, i) if fields(i).dataType == IntegerType => v.toInt
        case (v: Long, i) if fields(i).dataType == DoubleType => v.toDouble
        case (v, i) if fields(i).dataType == StringType && v != null &&
          !v.isInstanceOf[String] => v.toString
        case (v, _) => v
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(coerced.toIndexedSeq),
      StructType(fields.toIndexedSeq))
  }

  /** Column type inferred over ALL rows, not the first non-null value:
    * SQLite columns are dynamically typed (a REAL-affinity column stores
    * whole numbers as INTEGER serials), so a column can yield both Long
    * and Double — widen to Double; any other mix degrades to String. */
  private def inferType(rows: Seq[Row], i: Int): DataType = {
    var long = false; var dbl = false; var bytes = false; var other = false
    rows.foreach { r =>
      r.get(i) match {
        case null =>
        case _: Long => long = true
        case _: Double => dbl = true
        case _: Array[Byte] => bytes = true
        case _ => other = true
      }
    }
    if (other || (bytes && (long || dbl))) StringType
    else if (bytes) BinaryType
    else if (dbl) DoubleType
    else if (long) LongType
    else StringType
  }

  /** Golden-parity query (SURVEY.md §5.2): the reference's flagship area
    * computation on its OWN data — lu.gpkg → ILIKE '%mangrove%' →
    * transform srid 100000 → 4326 → 3857 → shoelace area / 10⁴ ha.
    * Golden: 4.16 (results/summary_report.csv:2). */
  private val q49 = Q(
    "q49_gpkg_golden_area",
    (s, _) => {
      val lu = readLayer(s, "/root/reference/data/lu.gpkg", "lu")
      lu.filter(graft.ops.Relational.asciiLower(col("KETERANGAN")).contains("mangrove"))
        .withColumn("geom3857",
          G.stTransform(col("geom"), col("geom_srid"), lit(Crs.WebMercator)))
        .groupBy(col("KETERANGAN").as("keterangan"))
        .agg(round(sum(graft.geo.GeoExpressions.stAreaNative(col("geom3857")) / 10000.0), 2).as("area_ha"),
          count(lit(1)).as("n_features"))
        .orderBy(asc_nulls_first("keterangan"))
    },
    None,
    "S1 GeoPackage scan + reference golden area on the reference's own lu.gpkg")

  val all: Seq[Q] = Seq(q49)
}
