package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal from-scratch SQLite database WRITER (the sink twin of the
  * [[Sqlite]] reader; S10 geo sink, SURVEY.md §2.1). Implements the
  * published file format (sqlite.org/fileformat2.html): 4096-byte pages,
  * table b-trees (leaf + one interior level), record serial types,
  * varints, and payload overflow chains. Enough to emit a valid GeoPackage
  * that sqlite3/GDAL can open; not a general-purpose engine (no indexes,
  * no WAL, no freelist).
  *
  * Values accepted per cell: null, Long, Double, String, Array[Byte].
  * A column declared `INTEGER PRIMARY KEY` is the rowid alias: its value
  * becomes the rowid and is stored as NULL in the record, exactly like
  * SQLite itself does. */
object SqliteWriter {

  val PageSize = 4096

  final case class TableSpec(name: String, sql: String, rows: Seq[Seq[Any]])

  // ---- low-level encoders -------------------------------------------------

  /** SQLite varint: big-endian 7-bit groups, high bit = continuation; a
    * full 9-byte varint's LAST byte carries 8 bits (so negative longs and
    * values ≥ 2^56 take exactly 9 bytes). */
  private def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 127) Array(v.toByte)
    else if (v < 0 || v >= (1L << 56)) {
      val out = new Array[Byte](9)
      var x = v
      out(8) = (x & 0xFF).toByte
      x >>>= 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7F) | 0x80).toByte; x >>>= 7; i -= 1 }
      out
    } else {
      val groups = scala.collection.mutable.ArrayBuffer.empty[Long]
      var x = v
      while (x != 0) { groups += (x & 0x7F); x >>>= 7 }
      val gs = groups.reverse
      gs.indices.map { i =>
        (gs(i) | (if (i == gs.length - 1) 0L else 0x80L)).toByte
      }.toArray
    }
  }

  /** (serialType, bodyBytes) for one value. Integers use the smallest
    * fitting width (types 1,2,3,4,5,6 → 1,2,3,4,6,8 bytes). */
  private def encodeValue(v: Any): (Long, Array[Byte]) = v match {
    case null => (0L, Array.emptyByteArray)
    case i: Long =>
      def be(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        var k = n - 1; var x = i
        while (k >= 0) { b(k) = (x & 0xFF).toByte; x >>= 8; k -= 1 }
        b
      }
      if (i >= Byte.MinValue && i <= Byte.MaxValue) (1L, be(1))
      else if (i >= Short.MinValue && i <= Short.MaxValue) (2L, be(2))
      else if (i >= -8388608L && i <= 8388607L) (3L, be(3))
      else if (i >= Int.MinValue && i <= Int.MaxValue) (4L, be(4))
      else if (i >= -140737488355328L && i <= 140737488355327L) (5L, be(6))
      else (6L, be(8))
    case d: Double =>
      val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN); b.putDouble(d)
      (7L, b.array())
    case s: String =>
      val bytes = s.getBytes("UTF-8"); (13L + 2L * bytes.length, bytes)
    case b: Array[Byte] => (12L + 2L * b.length, b)
    case other => throw new IllegalArgumentException(
      s"unsupported SQLite value: ${other.getClass}")
  }

  /** Full record payload: header (size varint + serial types) + bodies. */
  private def record(values: Seq[Any]): Array[Byte] = {
    val enc = values.map(encodeValue)
    val typeVarints = enc.map(e => varint(e._1))
    val typesLen = typeVarints.map(_.length).sum
    // header size varint includes itself — iterate to fixpoint (≤2 rounds)
    var hdrLen = typesLen + 1
    if (varint(hdrLen.toLong).length + typesLen != hdrLen)
      hdrLen = varint((typesLen + 2).toLong).length + typesLen
    val out = ByteBuffer.allocate(hdrLen + enc.map(_._2.length).sum)
    out.put(varint(hdrLen.toLong))
    typeVarints.foreach(out.put)
    enc.foreach(e => out.put(e._2))
    out.array()
  }

  // ---- page assembly ------------------------------------------------------

  private final class PageStore {
    val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    /** Reserve a page, returning its 1-based number. */
    def alloc(): Int = { pages += null; pages.length }
    def set(num: Int, bytes: Array[Byte]): Unit = {
      require(bytes.length == PageSize); pages(num - 1) = bytes
    }
  }

  /** Leaf cell bytes for (rowid, payload), spilling to overflow pages. */
  private def leafCell(store: PageStore, payload: Array[Byte], rowid: Long): Array[Byte] = {
    val u = PageSize // overflow/local thresholds use the full usable size
    val maxLocal = u - 35
    if (payload.length <= maxLocal) {
      val out = ByteBuffer.allocate(16 + payload.length)
      out.put(varint(payload.length.toLong)).put(varint(rowid)).put(payload)
      java.util.Arrays.copyOf(out.array(), out.position())
    } else {
      val minLocal = (u - 12) * 32 / 255 - 23
      var local = minLocal + (payload.length - minLocal) % (u - 4)
      if (local > maxLocal) local = minLocal
      // overflow chain
      var off = local
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      while (off < payload.length) {
        val take = math.min(u - 4, payload.length - off)
        chunks += java.util.Arrays.copyOfRange(payload, off, off + take)
        off += take
      }
      val pageNums = chunks.map(_ => store.alloc())
      chunks.indices.foreach { i =>
        val page = ByteBuffer.allocate(PageSize)
        page.putInt(if (i + 1 < pageNums.length) pageNums(i + 1) else 0)
        page.put(chunks(i))
        store.set(pageNums(i), page.array())
      }
      val out = ByteBuffer.allocate(20 + local)
      out.put(varint(payload.length.toLong)).put(varint(rowid))
        .put(payload, 0, local).putInt(pageNums.head)
      java.util.Arrays.copyOf(out.array(), out.position())
    }
  }

  /** Build one table b-tree; returns its root page number.
    * `pageOne` pins the root to page 1 (sqlite_schema). Interior levels
    * stack as deep as needed (each level fans out ~270×), so table size is
    * bounded by disk, not by the tree — sqlite_schema is still required to
    * fit page 1. */
  private def buildTable(store: PageStore, rows: Seq[(Long, Array[Byte])],
      pageOne: Boolean, label: String = "table"): Int = {
    // pack cells into leaves
    val leaves = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[(Long, Array[Byte])])]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var curBytes = 0
    def headerSize(first: Boolean) = (if (first && pageOne && leaves.isEmpty) 100 else 0) + 8
    def flush(): Unit = if (cur.nonEmpty || leaves.isEmpty) {
      val num = if (pageOne && leaves.isEmpty) 1 else store.alloc()
      leaves += ((num, cur.toSeq)); cur = scala.collection.mutable.ArrayBuffer.empty
      curBytes = 0
    }
    rows.foreach { case (rowid, payload) =>
      val cell = leafCell(store, payload, rowid)
      val need = cell.length + 2
      val cap = PageSize - headerSize(true) - 8
      if (curBytes + need > cap && cur.nonEmpty) flush()
      cur += ((rowid, cell)); curBytes += need
    }
    flush()

    def writeLeaf(num: Int, cells: Seq[(Long, Array[Byte])]): Unit = {
      val base = if (num == 1) 100 else 0
      val page = new Array[Byte](PageSize)
      val buf = ByteBuffer.wrap(page)
      var contentOff = PageSize
      val ptrs = scala.collection.mutable.ArrayBuffer.empty[Int]
      cells.foreach { case (_, cell) =>
        contentOff -= cell.length
        System.arraycopy(cell, 0, page, contentOff, cell.length)
        ptrs += contentOff
      }
      buf.position(base)
      buf.put(13.toByte).putShort(0)
        .putShort(cells.length.toShort)
        .putShort((contentOff & 0xFFFF).toShort).put(0.toByte)
      ptrs.foreach(p => buf.putShort(p.toShort))
      store.set(num, page)
    }
    leaves.foreach { case (num, cells) => writeLeaf(num, cells) }

    if (leaves.length == 1) leaves.head._1
    else {
      // interior levels bottom-up: cells = (leftChildPage, maxRowidInChild),
      // rightmost child in the header; stack levels until one root remains
      def writeInterior(num: Int, kids: Seq[(Int, Long)]): Unit = {
        val base = if (num == 1) 100 else 0
        val page = new Array[Byte](PageSize)
        val buf = ByteBuffer.wrap(page)
        var contentOff = PageSize
        val ptrs = scala.collection.mutable.ArrayBuffer.empty[Int]
        kids.init.foreach { case (child, key) =>
          val cell = ByteBuffer.allocate(13)
          cell.putInt(child).put(varint(key))
          val c = java.util.Arrays.copyOf(cell.array(), cell.position())
          contentOff -= c.length
          System.arraycopy(c, 0, page, contentOff, c.length)
          ptrs += contentOff
        }
        require(base + 12 + 2 * ptrs.length <= contentOff,
          s"$label: interior page overflow")
        buf.position(base)
        buf.put(5.toByte).putShort(0)
          .putShort(ptrs.length.toShort)
          .putShort((contentOff & 0xFFFF).toShort).put(0.toByte)
          .putInt(kids.last._1) // right-most pointer
        ptrs.foreach(p => buf.putShort(p.toShort))
        store.set(num, page)
      }
      // conservative per-page fan-out: ≤13-byte cell + 2-byte pointer each
      val maxKids = (PageSize - 12) / 15
      val maxRootKids = (PageSize - 12 - (if (pageOne) 100 else 0)) / 15
      var level: Seq[(Int, Long)] =
        leaves.map { case (num, cells) => (num, cells.last._1) }.toSeq
      while (level.length > 1) {
        if (level.length <= maxRootKids) {
          val root = if (pageOne) 1 else store.alloc()
          require(!pageOne || leaves.head._1 != 1, "schema table spilled past one page")
          writeInterior(root, level)
          level = Seq((root, level.last._2))
        } else {
          // avoid a dangling single-child tail page: rebalance the last
          // two groups so every interior page carries ≥1 cell
          val groups0 = level.grouped(maxKids).toSeq
          val groups =
            if (groups0.last.length == 1)
              groups0.dropRight(2) :+ groups0(groups0.length - 2).init :+
                (groups0(groups0.length - 2).takeRight(1) ++ groups0.last)
            else groups0
          level = groups.map { g =>
            val num = store.alloc()
            writeInterior(num, g)
            (num, g.last._2)
          }
        }
      }
      level.head._1
    }
  }

  private def columnDefs(sql: String): Seq[String] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
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
    parts.map(_.trim).toSeq
  }

  private def pkIndex(sql: String): Int =
    columnDefs(sql).indexWhere { d =>
      val u = d.toUpperCase
      u.contains("INTEGER") && u.contains("PRIMARY KEY")
    }

  /** Constraints that would make SQLite expect an automatic index b-tree
    * (which this writer does not emit): any non-INTEGER PRIMARY KEY or
    * UNIQUE column. Fail loudly instead of writing a file that
    * integrity_check calls malformed. */
  private def requireNoAutoindex(t: TableSpec): Unit =
    columnDefs(t.sql).foreach { d =>
      val u = d.toUpperCase
      require(!(u.contains("PRIMARY KEY") && !u.contains("INTEGER")),
        s"table ${t.name}: non-INTEGER PRIMARY KEY needs an autoindex — unsupported ($d)")
      require(!u.contains("UNIQUE"),
        s"table ${t.name}: UNIQUE needs an autoindex — unsupported ($d)")
    }

  /** Write a database file with the given tables. */
  def write(path: String, tables: Seq[TableSpec]): Unit = {
    val store = new PageStore
    store.alloc() // page 1 = sqlite_schema root (pinned)

    tables.foreach(requireNoAutoindex)
    val roots = tables.map { t =>
      val pk = pkIndex(t.sql)
      val encoded = t.rows.zipWithIndex.map { case (vals, i) =>
        val rowid =
          if (pk >= 0 && vals(pk) != null) vals(pk).asInstanceOf[Long]
          else (i + 1).toLong
        val stored =
          if (pk >= 0) vals.updated(pk, null) else vals
        (rowid, record(stored))
      }
      // b-tree keys must ascend; rowid-alias values may arrive unsorted
      t.name -> buildTable(store, encoded.sortBy(_._1), pageOne = false, t.name)
    }

    val schemaRows: Seq[(Long, Array[Byte])] = roots.zipWithIndex.map {
      case ((name, root), i) =>
        val t = tables(i)
        ((i + 1).toLong,
          record(Seq("table", name, name, root.toLong, t.sql)))
    }
    buildTable(store, schemaRows, pageOne = true, "sqlite_schema")

    // file header on page 1
    val p1 = store.pages(0)
    val hdr = ByteBuffer.wrap(p1)
    hdr.put("SQLite format 3".getBytes("US-ASCII")).put(0.toByte)
    hdr.putShort(PageSize.toShort)        // 16 page size
    hdr.put(1.toByte).put(1.toByte)       // 18 file format write/read version
    hdr.put(0.toByte)                     // 20 reserved space
    hdr.put(64.toByte).put(32.toByte).put(32.toByte) // 21-23 payload fractions
    hdr.putInt(1)                         // 24 file change counter
    hdr.putInt(store.pages.length)        // 28 database size in pages
    hdr.putInt(0).putInt(0)               // 32 freelist head, count
    hdr.putInt(1)                         // 40 schema cookie
    hdr.putInt(1)                         // 44 schema format number
    hdr.putInt(0)                         // 48 default page cache
    hdr.putInt(0)                         // 52 largest root (vacuum)
    hdr.putInt(1)                         // 56 text encoding = UTF-8
    hdr.putInt(0)                         // 60 user version
    hdr.putInt(0)                         // 64 incremental vacuum
    hdr.putInt(0)                         // 68 application id
    hdr.position(92)
    hdr.putInt(1)                         // version-valid-for
    hdr.putInt(3045000)                   // sqlite version number stamp
    val out = new java.io.FileOutputStream(path)
    try store.pages.foreach(out.write)
    finally out.close()
  }
}
