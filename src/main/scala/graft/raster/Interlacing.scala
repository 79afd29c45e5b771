package graft.raster

/** MuCOG interlacing patterns — the storage-layout language that orders the
  * data blocks of a multi-image tiled GeoTIFF stack for locality
  * (reference: api/v1/pb/layouts.proto:40-66; docs/architecture/mucog.md).
  *
  * A pattern is one or more chains separated by `;`; each chain prioritizes
  * the four levels `[R]ecords > [B]ands > [Z]oom levels > [T]iles` in some
  * order, optionally restricted by a selector: `B=0,2,3` (values) or
  * `Z=1:` (range, hi-exclusive, open ends allowed). Blocks are emitted by
  * nesting the chain's loops left-to-right, so all L4 blocks of a given
  * (L1,L2,L3) are contiguous. E.g. the MuCOG timeseries layout
  * `Z=0>T>R>B;Z=1:>R>T>B`: full-resolution blocks are grouped per tile
  * across records (one range-read per timeseries block), overviews stay
  * per-record contiguous.
  */
object Interlacing {

  sealed trait Sel { def accepts(i: Int, max: Int): Boolean }
  case object All extends Sel { def accepts(i: Int, max: Int) = true }
  final case class Values(vs: Set[Int]) extends Sel {
    def accepts(i: Int, max: Int): Boolean = vs(i)
  }
  final case class Range(lo: Int, hi: Option[Int]) extends Sel {
    def accepts(i: Int, max: Int): Boolean = i >= lo && i < hi.getOrElse(max)
  }
  final case class Level(dim: Char, sel: Sel)
  final case class Chain(levels: Seq[Level]) {
    require(levels.map(_.dim).sorted == Seq('B', 'R', 'T', 'Z'),
      s"chain must order exactly R,B,Z,T once each: ${levels.map(_.dim).mkString(">")}")
  }

  /** True when every chain's outermost level is Z — the MuCOG timeseries
    * shape. A zoom-led pattern also groups the IFDs per zoom level
    * (mucog.go:30-48): full-res directories first, then each overview
    * level across records. */
  def zoomLed(chains: Seq[Chain]): Boolean =
    chains.nonEmpty && chains.forall(_.levels.head.dim == 'Z')

  /** Parse a pattern; throws IllegalArgumentException on malformed input
    * (the validation the reference runs on layout creation, layout.go:127). */
  def parse(pattern: String): Seq[Chain] =
    pattern.split(";").toSeq.map { chainStr =>
      Chain(chainStr.trim.split(">").toSeq.map { lvl =>
        val t = lvl.trim
        require(t.nonEmpty, s"empty level in '$chainStr'")
        val dim = t.head.toUpper
        require("RBZT".contains(dim), s"unknown level '$dim' in '$chainStr'")
        val sel = if (t.length == 1) All
        else {
          require(t(1) == '=', s"bad selector '$t'")
          require(dim != 'T', "Tile level cannot have a selector")
          val spec = t.drop(2)
          if (spec.contains(":")) {
            val parts = spec.split(":", -1)
            require(parts.length == 2, s"bad range '$spec'")
            Range(if (parts(0).isEmpty) 0 else parts(0).toInt,
              if (parts(1).isEmpty) None else Some(parts(1).toInt))
          } else Values(spec.split(",").map(_.trim.toInt).toSet)
        }
        Level(dim, sel)
      })
    }

  /** Emit (record, zoom, band, tile) tuples in pattern order over a block
    * space with per-record zoom counts, per-record band counts and
    * per-(record,zoom) tile counts. Tuples matched by several chains are
    * emitted once (first chain wins); blocks no chain selects are appended
    * in natural R>Z>B>T order so the file always contains every block. */
  def enumerate(chains: Seq[Chain], nR: Int, nZ: Int => Int,
      nB: Int => Int, nT: (Int, Int) => Int): Seq[(Int, Int, Int, Int)] = {
    val maxZ = (0 until nR).map(nZ).max
    val maxB = (0 until nR).map(nB).max
    val maxT = (for (r <- 0 until nR; z <- 0 until nZ(r)) yield nT(r, z)).max
    def dimMax(d: Char): Int = d match {
      case 'R' => nR; case 'Z' => maxZ; case 'B' => maxB; case 'T' => maxT
    }
    val seen = scala.collection.mutable.LinkedHashSet.empty[(Int, Int, Int, Int)]
    for (chain <- chains) {
      def loop(idx: Int, r: Int, z: Int, b: Int, t: Int): Unit =
        if (idx == chain.levels.size) {
          // validity against the per-record ragged bounds
          if (z < nZ(r) && b < nB(r) && t < nT(r, z)) seen += ((r, z, b, t))
        } else {
          val Level(dim, sel) = chain.levels(idx)
          var i = 0
          val m = dimMax(dim)
          while (i < m) {
            if (sel.accepts(i, m)) dim match {
              case 'R' => loop(idx + 1, i, z, b, t)
              case 'Z' => loop(idx + 1, r, i, b, t)
              case 'B' => loop(idx + 1, r, z, i, t)
              case 'T' => loop(idx + 1, r, z, b, i)
            }
            i += 1
          }
        }
      loop(0, 0, 0, 0, 0)
    }
    // leftovers (chains with selectors may not cover the full space)
    for (r <- 0 until nR; z <- 0 until nZ(r); b <- 0 until nB(r); t <- 0 until nT(r, z))
      seen += ((r, z, b, t))
    seen.toSeq
  }
}
