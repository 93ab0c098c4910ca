package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal read-only SQLite 3 file reader — just enough to scan a
  * GeoPackage layer (S1, SURVEY.md §2.1) with zero dependencies (no
  * sqlite-jdbc offline). Implements: page/b-tree traversal, record
  * (serial-type) decoding, varints, and overflow-page chains, per the
  * published SQLite file-format spec (sqlite.org/fileformat2.html).
  *
  * Scope: table b-trees only (no indices, no WAL, no freelist reuse),
  * read-all semantics — GPKG fixtures are small config-like artifacts; at
  * scale you convert once to Parquet (Ingest.gpkgToParquet).
  */
object Sqlite {

  final case class Table(name: String, rootPage: Int, sql: String)

  final class Db(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bytes.length > 100 && new String(bytes, 0, 15, "ASCII") == "SQLite format 3",
      "not a SQLite file")
    val pageSize: Int = {
      val raw = ((bytes(16) & 0xFF) << 8) | (bytes(17) & 0xFF)
      if (raw == 1) 65536 else raw
    }
    private val reserved = bytes(20) & 0xFF
    private val usable = pageSize - reserved

    // ---- varint ----------------------------------------------------------
    /** (value, bytesConsumed) */
    private def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(off + i)
        v = (v << 7) | (b & 0x7F)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (bytes(off + 8) & 0xFF), 9)
    }

    private def u16(off: Int): Int = ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    private def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)

    // ---- b-tree walk -----------------------------------------------------
    /** Visit every (rowid, payload) of a table b-tree rooted at `page`. */
    def scanTable(page: Int)(f: (Long, Array[Byte]) => Unit): Unit = {
      val base = (page - 1) * pageSize
      val hdr = base + (if (page == 1) 100 else 0)
      val pType = bytes(hdr) & 0xFF
      val nCells = u16(hdr + 3)
      pType match {
        case 0x05 => // interior table page
          val ptrArray = hdr + 12
          var i = 0
          while (i < nCells) {
            val cell = base + u16(ptrArray + 2 * i)
            scanTable(u32(cell).toInt)(f)
            i += 1
          }
          scanTable(u32(hdr + 8).toInt)(f) // rightmost child
        case 0x0D => // leaf table page
          val ptrArray = hdr + 8
          var i = 0
          while (i < nCells) {
            var off = base + u16(ptrArray + 2 * i)
            val (payloadLen, c1) = varint(off); off += c1
            val (rowid, c2) = varint(off); off += c2
            f(rowid, readPayload(off, payloadLen.toInt))
            i += 1
          }
        case t => throw new IllegalStateException(s"unexpected page type 0x${t.toHexString}")
      }
    }

    /** Assemble a cell payload, following overflow pages when needed. */
    private def readPayload(off: Int, payloadLen: Int): Array[Byte] = {
      val maxLocal = usable - 35
      if (payloadLen <= maxLocal) {
        java.util.Arrays.copyOfRange(bytes, off, off + payloadLen)
      } else {
        val minLocal = (usable - 12) * 32 / 255 - 23
        var local = minLocal + (payloadLen - minLocal) % (usable - 4)
        if (local > maxLocal) local = minLocal
        val out = new Array[Byte](payloadLen)
        System.arraycopy(bytes, off, out, 0, local)
        var written = local
        var page = u32(off + local)
        while (page != 0 && written < payloadLen) {
          val pBase = (page.toInt - 1) * pageSize
          val next = u32(pBase)
          val chunk = math.min(usable - 4, payloadLen - written)
          System.arraycopy(bytes, pBase + 4, out, written, chunk)
          written += chunk
          page = next
        }
        out
      }
    }

    // ---- record decode ---------------------------------------------------
    /** Decode a record payload into column values (null / Long / Double /
      * String / Array[Byte]). */
    def decodeRecord(payload: Array[Byte]): Array[Any] = {
      def vint(off: Int): (Long, Int) = {
        var v = 0L; var i = 0
        while (i < 8) {
          val b = payload(off + i)
          v = (v << 7) | (b & 0x7F)
          if ((b & 0x80) == 0) return (v, i + 1)
          i += 1
        }
        ((v << 8) | (payload(off + 8) & 0xFF), 9)
      }
      val (hdrLen, c0) = vint(0)
      var hOff = c0
      val types = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (hOff < hdrLen) {
        val (t, c) = vint(hOff); types += t; hOff += c
      }
      var dOff = hdrLen.toInt
      types.map { t =>
        def intN(n: Int): Long = {
          var v: Long = payload(dOff).toLong // sign-extend from first byte
          var i = 1
          while (i < n) { v = (v << 8) | (payload(dOff + i) & 0xFF); i += 1 }
          dOff += n
          v
        }
        (t: @unchecked) match {
          case 0 => null
          case 1 => intN(1)
          case 2 => intN(2)
          case 3 => intN(3)
          case 4 => intN(4)
          case 5 => intN(6)
          case 6 => intN(8)
          case 7 =>
            val v = java.lang.Double.longBitsToDouble(intN(8)); v
          case 8 => 0L
          case 9 => 1L
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            val out = java.util.Arrays.copyOfRange(payload, dOff, dOff + len)
            dOff += len; out
          case n if n >= 13 =>
            val len = ((n - 13) / 2).toInt
            val out = new String(payload, dOff, len, "UTF-8")
            dOff += len; out
        }
      }.toArray
    }

    /** Tables from sqlite_schema (root = page 1). */
    def tables: Seq[Table] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Table]
      scanTable(1) { (_, payload) =>
        val r = decodeRecord(payload)
        if (r.length >= 5 && r(0) == "table")
          out += Table(r(1).asInstanceOf[String], r(3).asInstanceOf[Long].toInt,
            r(4).asInstanceOf[String])
      }
      out.toSeq
    }

    /** Column definitions parsed from CREATE TABLE sql (top-level commas,
      * table-level constraints dropped). */
    private def columnDefs(t: Table): Seq[String] = {
      val body = t.sql.substring(t.sql.indexOf('(') + 1, t.sql.lastIndexOf(')'))
      var depth = 0
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      body.foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case c => cur += c
      }
      parts += cur.toString
      parts.toSeq.map(_.trim)
        .filterNot(p => p.toUpperCase.startsWith("CONSTRAINT") ||
          p.toUpperCase.startsWith("PRIMARY KEY") ||
          p.toUpperCase.startsWith("FOREIGN KEY") || p.toUpperCase.startsWith("UNIQUE") ||
          p.toUpperCase.startsWith("CHECK"))
    }

    /** Column names parsed from CREATE TABLE sql. */
    def columnNames(t: Table): Seq[String] =
      columnDefs(t).map(p => p.split("\\s+")(0).stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]"))

    /** Index of the rowid-alias column (declared INTEGER PRIMARY KEY) in
      * [[columnNames]] order, or -1. SQLite stores that column as null in
      * the record payload; readers must substitute the rowid — at WHATEVER
      * position the column was declared, not necessarily first. */
    def rowidAliasIndex(t: Table): Int =
      columnDefs(t).indexWhere { d =>
        val u = d.toUpperCase
        u.contains("INTEGER") && u.contains("PRIMARY KEY")
      }

    /** All rows of a named table as (rowid, values). INTEGER PRIMARY KEY
      * columns are stored as null in the record — callers substitute the
      * rowid. */
    def rows(name: String): Seq[(Long, Array[Any])] = {
      val t = tables.find(_.name == name)
        .getOrElse(throw new NoSuchElementException(s"table $name"))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Any])]
      scanTable(t.rootPage) { (rowid, payload) => out += ((rowid, decodeRecord(payload))) }
      out.toSeq
    }
  }

  def open(path: String): Db = new Db(Files.readAllBytes(Paths.get(path)))
}
