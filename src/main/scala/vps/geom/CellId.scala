package vps.geom

/** H3/S2-style spatial cell index over the ZXY grid: a 64-bit cell id packing
  * (level, mortonInterleave(x, y)). Z-order interleaving gives range locality
  * (children of a cell are a contiguous id range), which is what lets a
  * cell-range predicate prune partitions — the role H3/S2 play in the north rule.
  *
  * Layout: bits [63..58] = level (0..29), bits [2*level-1..0] = morton(x, y)
  * with x in even bit positions, y in odd.
  */
object CellId {
  val MaxLevel = 29

  /** Spread the low 32 bits of v into the even bit positions of a 64-bit word. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Inverse of [[spread]]. */
  def squash(v0: Long): Long = {
    var v = v0 & 0x5555555555555555L
    v = (v | (v >>> 1)) & 0x3333333333333333L
    v = (v | (v >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >>> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >>> 8)) & 0x0000ffff0000ffffL
    v = (v | (v >>> 16)) & 0x00000000ffffffffL
    v
  }

  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def pack(level: Int, x: Long, y: Long): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of [0,$MaxLevel]")
    (level.toLong << 58) | morton(x, y)
  }

  private val MortonMask = (1L << 58) - 1
  def level(cell: Long): Int = ((cell >>> 58) & 0x3f).toInt
  def x(cell: Long): Long = squash(cell & MortonMask)
  def y(cell: Long): Long = squash((cell & MortonMask) >>> 1)

  /** Cell containing a lon/lat point at the given level. */
  def fromLonLat(lon: Double, lat: Double, level: Int): Long =
    pack(level, TileMath.tileX(lon, level).toLong, TileMath.tileY(lat, level).toLong)

  /** Parent cell at a coarser level. */
  def parent(cell: Long, toLevel: Int): Long = {
    val l = level(cell)
    require(toLevel <= l, s"parent level $toLevel must be <= $l")
    pack(toLevel, x(cell) >>> (l - toLevel), y(cell) >>> (l - toLevel))
  }

  /** Contiguous [min, max] id range covered by a cell's descendants at `childLevel` —
    * this is what makes Z-order ids partition-prunable with plain range predicates.
    */
  def childRange(cell: Long, childLevel: Int): (Long, Long) = {
    val l = level(cell)
    require(childLevel >= l)
    val d = childLevel - l
    val m = morton(x(cell), y(cell))
    val lo = (childLevel.toLong << 58) | (m << (2 * d))
    val hi = lo | ((1L << (2 * d)) - 1)
    (lo, hi)
  }

  /** k-ring: all cells within Chebyshev distance k (the quad-grid analogue of H3
    * kRing; SURVEY.md §2.3 J10). Grid wraps in x (antimeridian), clamps in y.
    * Size = (2k+1)^2 interior cells (minus y-clamped rows at the poles).
    */
  def kRing(cell: Long, k: Int): Seq[Long] = {
    val l = level(cell)
    val n = 1L << l
    val cx = x(cell)
    val cy = y(cell)
    // distinct: when 2k+1 >= n the x wrap revisits cells — dedupe (insertion
    // order preserved) or duplicate candidates eat top-k slots downstream
    val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
    var dy = -k
    while (dy <= k) {
      val yy = cy + dy
      if (yy >= 0 && yy < n) {
        var dx = -k
        while (dx <= k) {
          seen += pack(l, java.lang.Math.floorMod(cx + dx, n), yy)
          dx += 1
        }
      }
      dy += 1
    }
    seen.toSeq
  }
}
