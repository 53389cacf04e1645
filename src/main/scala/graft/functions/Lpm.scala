package graft.functions

import org.apache.spark.sql.Column

/** Longest-prefix-match lookup over a broadcast prefix table (SURVEY §2.4
  * J5; reference `outlet/networks/root.go:198-299`: GeoIP + remote sources
  * + static config merged into one table, child prefixes inheriting parent
  * attributes).
  *
  * Scale shape: the prefix set is a dimension (≤ a few million rows) —
  * build once on the driver with inheritance flattened, ship the sorted
  * arrays inside the UDF closure (one copy per executor), resolve each
  * address with binary search + a parent-chain walk (≤ nesting depth).
  * The fact table never shuffles.
  */
object Lpm {

  /** One prefix with its attributes. */
  final case class PrefixEntry(cidr: String, attrs: Map[String, String])

  /** Immutable serializable LPM table. CIDR ranges are nested-or-disjoint;
    * entries are sorted by (lo asc, prefix length asc) and each carries a
    * pointer to its tightest enclosing entry. All ranges containing an
    * address lie on the ancestor chain of the last entry whose lo ≤ addr.
    */
  final class Table private[Lpm] (
      los: Array[Array[Byte]],
      his: Array[Array[Byte]],
      parents: Array[Int],
      attrs: Array[Map[String, String]]) extends Serializable {

    def size: Int = los.length

    /** Attributes of the most specific prefix containing `addr`. */
    def lookup(addr: Array[Byte]): Option[Map[String, String]] = {
      if (addr == null || los.length == 0) return None
      var left = 0
      var right = los.length - 1
      var candidate = -1
      while (left <= right) {
        val mid = (left + right) >>> 1
        if (Table.le(los(mid), addr)) { candidate = mid; left = mid + 1 }
        else right = mid - 1
      }
      var i = candidate
      while (i >= 0) {
        if (Table.le(addr, his(i))) return Some(attrs(i))
        i = parents(i)
      }
      None
    }
  }

  object Table {
    private[Lpm] def le(a: Array[Byte], b: Array[Byte]): Boolean = {
      var i = 0
      while (i < 16) {
        val x = a(i) & 0xff
        val y = b(i) & 0xff
        if (x != y) return x < y
        i += 1
      }
      true
    }

    private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < 16) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      0
    }

    /** Build with parent→child attribute inheritance flattened (reference
      * flattens at build: a child inherits every ancestor attribute it
      * doesn't override). Duplicate prefixes merge, later entries winning.
      */
    def build(entries: Seq[PrefixEntry]): Table = {
      val parsed = entries
        .map { e =>
          val (lo, hi) = Ip.cidrRange(e.cidr)
          val isV4 = e.cidr.takeWhile(_ != '/').contains('.')
          val b = e.cidr.dropWhile(_ != '/').drop(1).toInt + (if (isV4) 96 else 0)
          (lo, hi, b, e.attrs)
        }
        // merge duplicate prefixes (same range), later wins
        .groupBy(t => (t._1.toSeq, t._3))
        .map { case (_, group) =>
          val (lo, hi, b, _) = group.head
          (lo, hi, b, group.map(_._4).reduce(_ ++ _))
        }
        .toArray
        .sortWith { (x, y) =>
          val c = cmp(x._1, y._1)
          if (c != 0) c < 0 else x._3 < y._3
        }

      // nesting sweep: parent = tightest enclosing entry
      val parents = new Array[Int](parsed.length)
      val attrs = new Array[Map[String, String]](parsed.length)
      val stack = scala.collection.mutable.Stack[Int]()
      parsed.indices.foreach { i =>
        val (lo, hi, _, own) = parsed(i)
        while (stack.nonEmpty && !(le(parsed(stack.top)._1, lo) &&
          le(hi, parsed(stack.top)._2))) stack.pop()
        parents(i) = if (stack.isEmpty) -1 else stack.top
        attrs(i) = (if (parents(i) >= 0) attrs(parents(i)) else
          Map.empty[String, String]) ++ own
        stack.push(i)
      }
      new Table(parsed.map(_._1), parsed.map(_._2), parents, attrs)
    }
  }

  /** Column resolving a 16-byte binary address to one attribute (null when
    * unmatched). Native expression — the table ships as a task-serialized
    * reference object, one copy per executor
    * (see [[graft.expressions.LpmLookup]]).
    */
  def lookupAttr(table: Table, attr: String)(addrCol: Column): Column =
    graft.expressions.LpmLookup(addrCol, table, attr)

  /** Periodically refreshed prefix sources (SURVEY S8; reference
    * `outlet/networks/root.go:170-196` + `common/remotedatasource/`): merge
    * several loaders — GeoIP snapshots, remote prefix lists, static
    * config — in precedence order (later overrides earlier per prefix, as
    * [[Table.build]] merges), diff against the previous pull, and rebuild
    * the lookup table only when the merged entries actually changed.
    * Re-enrichment picks up the new [[table]] on its next batch — the
    * stream-static refresh pattern.
    */
  final class RefreshingTable(sources: Seq[() => Seq[PrefixEntry]]) {
    @volatile private var state: (Seq[PrefixEntry], Table) = (null, null)
    refresh()

    def table: Table = state._2

    /** Re-pulls every source; rebuilds on change. Returns true if rebuilt.
      * Synchronized: compare-and-rebuild must be atomic or two concurrent
      * refreshes can double-build or lose an update (cheap control-path
      * call — a lock here costs nothing).
      */
    def refresh(): Boolean = synchronized {
      val merged = sources.flatMap(_())
      if (state._1 == merged) false
      else { state = (merged, Table.build(merged)); true }
    }
  }

  /** Loads prefix entries from a headered CSV with a `prefix` column; every
    * other column becomes an attribute (nulls skipped) — the shape of the
    * reference orchestrator's dictionary CSVs (S7) and remote source lists.
    */
  def fromCsv(spark: org.apache.spark.sql.SparkSession, path: String): Seq[PrefixEntry] = {
    val df = spark.read.option("header", "true").csv(path)
    val attrCols = df.columns.filterNot(_ == "prefix")
    df.collect().toSeq.map { r =>
      PrefixEntry(r.getAs[String]("prefix"),
        attrCols.flatMap(c => Option(r.getAs[String](c)).map(c -> _)).toMap)
    }
  }
}
