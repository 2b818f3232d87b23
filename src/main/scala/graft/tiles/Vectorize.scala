package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Raster → polygons per constant-value region — the reference's
  * vectorize (reference: buteo/raster/vectorize.py:25-72, which delegates
  * to gdal.Polygonize at :64: 4-connected regions of equal pixel value,
  * no mask).
  *
  * Distributed shape (no driver-side pixel work):
  *  1. per-tile connected components (union-find over the tile's pixels,
  *     4-connectivity) → one provisional REGION row per tile component,
  *     labeled by its minimum global pixel index (deterministic);
  *  2. tile-boundary adjacency: each tile emits its 4 edge rows; a
  *     groupBy on the shared-edge key pairs up 4-adjacent equal-value
  *     pixels from both sides → label-graph EDGES (tiny relative to
  *     pixels: one node per tile-local region);
  *  3. cross-tile merge: iterative min-label propagation over the label
  *     graph (Pregel-style supersteps on DataFrames) until fixpoint —
  *     converges in O(region-graph diameter) rounds, each one small
  *     shuffle of the label table;
  *  4. final per-region aggregate: value, pixel count, pixel-space bbox,
  *     region key (global min pixel index).
  *
  * Polygon RINGS are not materialized — the region decomposition (which
  * pixels belong to which polygon, i.e. gdal.Polygonize's equivalence
  * classes) plus bbox/count is the queryable output; ring tracing is a
  * per-region local pass that can be layered on later.
  */
object Vectorize {

  /** Per-region rows: (band, v, region_key, n_px, x_min, x_max, y_min,
    * y_max). `region_key` = min global pixel index (y*width + x) of the
    * region — stable across any partitioning.
    */
  def vectorize(tiles: Dataset[Tile], spec: RasterSpec, maxIters: Int = 32): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val ts = spec.tileSize
    val W = spec.width.toLong; val H = spec.height.toLong

    // --- 1+2: per-tile union-find; emit components + boundary rows ---
    // component: (label, band, v, nPx, xMin, xMax, yMin, yMax)
    // boundary:  (edgeKey, pos, label, v)  — edgeKey identifies the shared
    //            tile edge; pos the pixel position along it
    val perTile = tiles.flatMap { t =>
      val w = t.w; val h = t.h
      val parent = Array.tabulate(w * h)(identity)
      def find(a: Int): Int = {
        var x = a
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      def union(a: Int, b: Int): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val px = t.pixels
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i = r * w + c
          if (c + 1 < w && px(i) == px(i + 1)) union(i, i + 1)
          if (r + 1 < h && px(i) == px(i + w)) union(i, i + w)
          c += 1
        }
        r += 1
      }
      val baseX = t.cellX.toLong * ts; val baseY = t.cellY.toLong * ts
      val bandOff = t.band.toLong * W * H
      def globalLabel(i: Int): Long = {
        val root = find(i)
        bandOff + (baseY + root / w) * W + (baseX + root % w)
      }
      // aggregate per root
      val agg = collection.mutable.HashMap.empty[Int, (Long, Long, Long, Long, Long)]
      var i = 0
      while (i < w * h) {
        val root = find(i)
        val gx = baseX + i % w; val gy = baseY + i / w
        agg.get(root) match {
          case None => agg(root) = (1L, gx, gx, gy, gy)
          case Some((n, x0, x1, y0, y1)) =>
            agg(root) = (n + 1, math.min(x0, gx), math.max(x1, gx),
              math.min(y0, gy), math.max(y1, gy))
        }
        i += 1
      }
      val comps = agg.iterator.map { case (root, (n, x0, x1, y0, y1)) =>
        (0, globalLabel(root), t.band, px(root), n, x0, x1, y0, y1, 0L, 0L)
      }
      // boundary rows: kind=1; reuse the tuple shape
      // (kind, label, band, v, _, _, _, _, _, edgeKey, pos)
      def edgeKey(vertical: Boolean, ex: Long, ey: Long): Long =
        ((ex * 1048576L + ey) * 2L + (if (vertical) 1L else 0L)) * 8L + t.band
      val bounds = collection.mutable.ArrayBuffer.empty[(Int, Long, Int, Double, Long, Long, Long, Long, Long, Long, Long)]
      var rr = 0
      while (rr < h) { // left edge (vertical edge at x = cellX) and right
        val li = rr * w
        bounds += ((1, globalLabel(li), t.band, px(li), 0L, 0L, 0L, 0L, 0L,
          edgeKey(vertical = true, t.cellX.toLong, t.cellY.toLong), baseY + rr))
        val ri = rr * w + (w - 1)
        bounds += ((1, globalLabel(ri), t.band, px(ri), 0L, 0L, 0L, 0L, 0L,
          edgeKey(vertical = true, t.cellX.toLong + 1L, t.cellY.toLong), baseY + rr))
        rr += 1
      }
      var cc = 0
      while (cc < w) { // top edge (horizontal at y = cellY) and bottom
        bounds += ((1, globalLabel(cc), t.band, px(cc), 0L, 0L, 0L, 0L, 0L,
          edgeKey(vertical = false, t.cellX.toLong, t.cellY.toLong), baseX + cc))
        val bi = (h - 1) * w + cc
        bounds += ((1, globalLabel(bi), t.band, px(bi), 0L, 0L, 0L, 0L, 0L,
          edgeKey(vertical = false, t.cellX.toLong, t.cellY.toLong + 1L), baseX + cc))
        cc += 1
      }
      comps ++ bounds.iterator
    }.toDF("kind", "label", "band", "v", "n_px", "x_min", "x_max", "y_min", "y_max",
      "edge_key", "pos")
      // cached at the tile plane's own width (floored at the core count)
      .coalesce(math.max(tiles.sparkSession.sparkContext.defaultParallelism,
        tiles.rdd.getNumPartitions))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val comps = perTile.filter(col("kind") === 0)
      .select("label", "band", "v", "n_px", "x_min", "x_max", "y_min", "y_max")
    // pair the two sides of each shared edge: equal (edge_key, pos) rows
    // from adjacent tiles with equal value → label-graph edge
    val b = perTile.filter(col("kind") === 1).select("label", "v", "edge_key", "pos")
    val edges = b.as("a").join(b.as("bb"),
        col("a.edge_key") === col("bb.edge_key") && col("a.pos") === col("bb.pos") &&
          col("a.label") < col("bb.label") && col("a.v") === col("bb.v"))
      .select(col("a.label").as("src"), col("bb.label").as("dst"))
      .distinct()

    val labels = resolveLabels(comps.select(col("label")), edges, maxIters)

    // --- 4: final aggregate per connected component ---
    comps.join(labels, "label")
      .groupBy(col("band"), col("comp"))
      .agg(min(col("v")).as("v"), // constant within a component
        sum(col("n_px")).as("n_px"),
        min(col("x_min")).as("x_min"), max(col("x_max")).as("x_max"),
        min(col("y_min")).as("y_min"), max(col("y_max")).as("y_max"),
        min(col("label")).as("region_key"))
      .select(col("band"), col("v"), col("region_key"), col("n_px"),
        col("x_min"), col("x_max"), col("y_min"), col("y_max"))
  }

  /** Raster → polygon RINGS per constant-value region: the full
    * gdal.Polygonize output shape (reference: buteo/raster/vectorize.py:64)
    * — one POLYGON per 4-connected region, outer ring + holes, in pixel
    * lattice coordinates as WKT with integer vertices.
    *
    * Distributed lifecycle on top of [[vectorize]]'s label graph:
    *  1. one radius-1 halo exchange gives every tile its neighbor VALUES;
    *     a boundary unit-edge exists exactly where the 4-neighbor value
    *     differs (or lies outside the raster). Equal-value neighbors are
    *     by construction the same region, so each region's edge set is
    *     emitted exactly once, tagged with the pixel's provisional label.
    *  2. the label graph is resolved as in [[vectorize]]; segments join
    *     to their global component (one small shuffle).
    *  3. per-region ring assembly is a LOCAL trace (groupByKey on the
    *     region id): interior-on-the-left directed edges, sharpest-left
    *     turn at pinch vertices (same tracer convention as
    *     geo.RectUnion), collinear runs merged, outer ring = positive
    *     shoelace (exactly one per 4-connected region), holes negative.
    *     Work per region is O(perimeter) — bounded by the region's own
    *     boundary, never the raster.
    *
    * Output: (band, v, region_key, n_px, wkt).
    */
  def vectorizeRings(tiles: Dataset[Tile], spec: RasterSpec,
                     maxIters: Int = 32, geoCoords: Boolean = false): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val ts = spec.tileSize
    val W = spec.width.toLong; val H = spec.height.toLong

    val padded = TileOps.convolvePad(tiles, 1)
    // row kinds: 0 = component (label, band, v, n_px);
    //            1 = shared-edge pairing row (label, v, edge_key, pos);
    //            2 = boundary segment (label, vx, vy, dir)
    val rows = padded.flatMap { case (t, pad, pw, _) =>
      val w = t.w; val h = t.h
      val parent = Array.tabulate(w * h)(identity)
      def find(a: Int): Int = {
        var x = a
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      def union(a: Int, b: Int): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val px = t.pixels
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i = r * w + c
          if (c + 1 < w && px(i) == px(i + 1)) union(i, i + 1)
          if (r + 1 < h && px(i) == px(i + w)) union(i, i + w)
          c += 1
        }
        r += 1
      }
      val baseX = t.cellX.toLong * ts; val baseY = t.cellY.toLong * ts
      val bandOff = t.band.toLong * W * H
      def globalLabel(i: Int): Long = {
        val root = find(i)
        bandOff + (baseY + root / w) * W + (baseX + root % w)
      }
      val out = collection.mutable.ArrayBuffer
        .empty[(Int, Long, Int, Double, Long, Long, Long, Long, Long, Int)]
      // kind-0 component rows
      val agg = collection.mutable.HashMap.empty[Int, Long]
      var i = 0
      while (i < w * h) { val root = find(i); agg(root) = agg.getOrElse(root, 0L) + 1L; i += 1 }
      agg.foreach { case (root, n) =>
        out += ((0, globalLabel(root), t.band, px(root), n, 0L, 0L, 0L, 0L, 0))
      }
      // kind-1 shared-edge pairing rows (same keys as vectorize)
      def edgeKey(vertical: Boolean, ex: Long, ey: Long): Long =
        ((ex * 1048576L + ey) * 2L + (if (vertical) 1L else 0L)) * 8L + t.band
      var rr = 0
      while (rr < h) {
        val li = rr * w
        out += ((1, globalLabel(li), t.band, px(li), 0L,
          edgeKey(vertical = true, t.cellX.toLong, t.cellY.toLong), baseY + rr, 0L, 0L, 0))
        val ri = rr * w + (w - 1)
        out += ((1, globalLabel(ri), t.band, px(ri), 0L,
          edgeKey(vertical = true, t.cellX.toLong + 1L, t.cellY.toLong), baseY + rr, 0L, 0L, 0))
        rr += 1
      }
      var cc = 0
      while (cc < w) {
        out += ((1, globalLabel(cc), t.band, px(cc), 0L,
          edgeKey(vertical = false, t.cellX.toLong, t.cellY.toLong), baseX + cc, 0L, 0L, 0))
        val bi = (h - 1) * w + cc
        out += ((1, globalLabel(bi), t.band, px(bi), 0L,
          edgeKey(vertical = false, t.cellX.toLong, t.cellY.toLong + 1L), baseX + cc, 0L, 0L, 0))
        cc += 1
      }
      // kind-2 boundary segments: neighbor value from the halo plane;
      // NaN = outside the raster = boundary. Directions follow
      // RectUnion's convention (interior on the LEFT):
      //   0=+x (neighbor above differs), 1=-x (below), 2=+y (right), 3=-y (left)
      def padAt(c: Int, r: Int): Double = pad((r + 1) * pw + (c + 1))
      r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val v = px(r * w + c)
          val lbl = globalLabel(r * w + c)
          val gx = baseX + c; val gy = baseY + r
          val up = padAt(c, r - 1); val dn = padAt(c, r + 1)
          val lf = padAt(c - 1, r); val rt = padAt(c + 1, r)
          if (up.isNaN || up != v) out += ((2, lbl, t.band, v, 0L, 0L, 0L, gx, gy, 0))
          if (dn.isNaN || dn != v) out += ((2, lbl, t.band, v, 0L, 0L, 0L, gx + 1, gy + 1, 1))
          if (rt.isNaN || rt != v) out += ((2, lbl, t.band, v, 0L, 0L, 0L, gx + 1, gy, 2))
          if (lf.isNaN || lf != v) out += ((2, lbl, t.band, v, 0L, 0L, 0L, gx, gy + 1, 3))
          c += 1
        }
        r += 1
      }
      out.iterator
    }.toDF("kind", "label", "band", "v", "n_px", "edge_key", "pos", "vx", "vy", "dir")
      // cached at the tile plane's own width (floored at the core count):
      // the halo-exchange upstream otherwise pins the conf partition
      // count and all three consumers re-scan those near-empty tasks
      .coalesce(math.max(tiles.sparkSession.sparkContext.defaultParallelism,
        tiles.rdd.getNumPartitions))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val comps = rows.filter(col("kind") === 0).select("label", "band", "v", "n_px")
    val b = rows.filter(col("kind") === 1).select("label", "v", "edge_key", "pos")
    val edges = b.as("a").join(b.as("bb"),
        col("a.edge_key") === col("bb.edge_key") && col("a.pos") === col("bb.pos") &&
          col("a.label") < col("bb.label") && col("a.v") === col("bb.v"))
      .select(col("a.label").as("src"), col("bb.label").as("dst"))
      .distinct()
    val labels = resolveLabels(comps.select(col("label")), edges, maxIters)

    val ringWkt = rows.filter(col("kind") === 2)
      .select(col("label"), col("vx"), col("vy"), col("dir"))
      .join(labels, "label")
      .select(col("comp"), col("vx"), col("vy"), col("dir"))
      .as[(Long, Long, Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (comp, it) =>
        // lattice vertices by default; geoCoords applies the raster's
        // geotransform (vectorize.py emits polygons in georef space)
        val fmt: (Long, Long) => String =
          if (geoCoords)
            (x, y) => s"${spec.originX + x * spec.pxW} ${spec.originY + y * spec.pxH}"
          else (x, y) => s"$x $y"
        (comp, traceWkt(it.map(s => (s._2, s._3, s._4)).toArray, fmt))
      }
      .toDF("comp", "wkt")

    comps.join(labels, "label")
      .groupBy(col("comp"))
      .agg(min(col("band")).as("band"), min(col("v")).as("v"),
        sum(col("n_px")).as("n_px"), min(col("label")).as("region_key"))
      .join(ringWkt, "comp")
      .select(col("band"), col("v"), col("region_key"), col("n_px"), col("wkt"))
  }

  /** Assemble one region's directed boundary unit-edges into WKT.
    * Same conventions as geo.RectUnion's tracer: dirs 0=+x 1=-x 2=+y
    * 3=-y, interior on the left, sharpest-left turn at pinch vertices,
    * collinear runs merged. Exactly one positive-shoelace (outer) ring
    * per 4-connected region; negative rings are holes. Vertices are
    * pixel-lattice integers; each ring is rotated to start at its
    * lexicographically smallest vertex for deterministic output.
    */
  private[tiles] def traceWkt(segsIn: Array[(Long, Long, Int)],
                              fmtVertex: (Long, Long) => String =
                                (x, y) => s"$x $y"): String = {
    // deterministic trace order regardless of partition order
    val segs = segsIn.sortBy(s => (s._1, s._2, s._3))
    val outMap = collection.mutable.HashMap.empty[(Long, Long), List[Int]]
    var i = segs.length - 1
    while (i >= 0) { // prepend in reverse so lists are ascending
      val k = (segs(i)._1, segs(i)._2)
      outMap(k) = i :: outMap.getOrElse(k, Nil)
      i -= 1
    }
    def endOf(s: (Long, Long, Int)): (Long, Long) = s._3 match {
      case 0 => (s._1 + 1, s._2)
      case 1 => (s._1 - 1, s._2)
      case 2 => (s._1, s._2 + 1)
      case _ => (s._1, s._2 - 1)
    }
    val leftOf = Array(2, 3, 1, 0)
    val rightOf = Array(3, 2, 0, 1)
    val backOf = Array(1, 0, 3, 2)
    val used = new Array[Boolean](segs.length)
    val rings = collection.mutable.ArrayBuffer.empty[Array[(Long, Long)]]
    var start = 0
    while (start < segs.length) {
      if (!used(start)) {
        val verts = collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val origin = (segs(start)._1, segs(start)._2)
        var cur = start
        var done = false
        while (!done) {
          used(cur) = true
          val k = (segs(cur)._1, segs(cur)._2)
          outMap(k) = outMap(k).filterNot(_ == cur)
          verts += k
          val nk = endOf(segs(cur))
          if (nk == origin) done = true
          else {
            val cands = outMap.getOrElse(nk, Nil)
            val d = segs(cur)._3
            val pref = Seq(leftOf(d), d, rightOf(d), backOf(d))
            cur = pref.iterator
              .flatMap(pd => cands.find(ci => segs(ci)._3 == pd)).next()
          }
        }
        // merge collinear runs
        val n = verts.length
        val keep = (0 until n).filter { vi =>
          val p = verts((vi - 1 + n) % n); val c = verts(vi); val q = verts((vi + 1) % n)
          !((p._1 == c._1 && c._1 == q._1) || (p._2 == c._2 && c._2 == q._2))
        }.map(verts(_)).toArray
        // rotate to lexicographic min start
        val minIdx = keep.indices.minBy(keep(_))
        rings += (keep.drop(minIdx) ++ keep.take(minIdx))
      }
      start += 1
    }
    def shoelace(ring: Array[(Long, Long)]): Long = {
      var s = 0L; var j = 0
      while (j < ring.length) {
        val (x1, y1) = ring(j); val (x2, y2) = ring((j + 1) % ring.length)
        s += x1 * y2 - x2 * y1
        j += 1
      }
      s
    }
    val (outer, holes) = rings.partition(shoelace(_) > 0)
    def fmt(ring: Array[(Long, Long)]): String =
      (ring :+ ring.head).map { case (x, y) => fmtVertex(x, y) }.mkString("(", ",", ")")
    val ordered = outer.sortBy(_.head) ++ holes.sortBy(_.head)
    ordered.map(fmt).mkString("POLYGON(", ",", ")")
  }

  /** Connected components over the LABEL graph. The region graph is
    * orders of magnitude smaller than the pixel plane (one node per
    * tile-local region), so when it fits comfortably on the driver we
    * solve it with a local union-find in one pass; otherwise we delegate
    * to Dedup.connectedComponents (alternating star contraction,
    * O(log² n) rounds — diameter-independent, unlike the min-label
    * propagation it replaced). The distributed path THROWS if contraction
    * has not converged within its round budget rather than returning
    * partial labels. Returns (label, comp) for every input label.
    */
  /** GDAL-sieve analog (gdal_sieve / SieveFilter): 4-connected regions
    * smaller than `minPixels` take the VALUE of their largest adjacent
    * region (ties → lowest region id). SINGLE-PASS CONTRACT: every
    * small region's target is chosen on the ORIGINAL labeling — GDAL's
    * iterative smallest-first merge can chain; one deterministic pass is
    * the contract here (and in the oracle), and repeated application
    * converges to the iterated form when needed. A small region with no
    * neighbor (one-region raster) keeps its value.
    *
    * Distribution: the [[vectorize]] label lifecycle (per-tile union-
    * find → boundary-pair label graph → star-contraction/driver resolve)
    * plus (a) DIFFERENT-value boundary pairs = cross-tile region
    * adjacency for free from the same edge rows, (b) in-tile adjacency
    * emitted locally deduped, (c) a per-pixel (pixel → provisional
    * label) frame that joins the final decision map — the decision map
    * is REGION-grain (small), so the pixel-grain work stays map-only.
    *
    * Output: per-pixel rows (x, y, band, v) of the sieved raster.
    */
  def sieve(tiles: Dataset[Tile], spec: RasterSpec, minPixels: Long,
            maxIters: Int = 32): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val ts = spec.tileSize
    val W = spec.width.toLong; val H = spec.height.toLong

    // kinds: 0 comp (label, band, v, n) · 1 boundary (label, v, ek, pos)
    //        2 in-tile adjacency (label, label2) · 3 pixel (label, v, gx, gy)
    val perTile = tiles.flatMap { t =>
      val w = t.w; val h = t.h
      val parent = Array.tabulate(w * h)(identity)
      def find(a: Int): Int = {
        var x = a
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      def union(a: Int, b: Int): Unit = {
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val px = t.pixels
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i = r * w + c
          if (c + 1 < w && px(i) == px(i + 1)) union(i, i + 1)
          if (r + 1 < h && px(i) == px(i + w)) union(i, i + w)
          c += 1
        }
        r += 1
      }
      val baseX = t.cellX.toLong * ts; val baseY = t.cellY.toLong * ts
      val bandOff = t.band.toLong * W * H
      def globalLabel(i: Int): Long = {
        val root = find(i)
        bandOff + (baseY + root / w) * W + (baseX + root % w)
      }
      val out = collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long, Int, Double, Long, Long, Long, Long)]
      // comps
      val agg = collection.mutable.HashMap.empty[Int, Long]
      var i = 0
      while (i < w * h) {
        val root = find(i)
        agg(root) = agg.getOrElse(root, 0L) + 1L
        i += 1
      }
      agg.foreach { case (root, n) =>
        out += ((0, globalLabel(root), 0L, t.band, px(root), n, 0L, 0L, 0L))
      }
      // boundary rows (both same-v merge and diff-v adjacency ride these)
      def edgeKey(vertical: Boolean, ex: Long, ey: Long): Long =
        ((ex * 1048576L + ey) * 2L + (if (vertical) 1L else 0L)) * 8L + t.band
      var rr = 0
      while (rr < h) {
        val li = rr * w
        out += ((1, globalLabel(li), 0L, t.band, px(li), 0L, 0L,
          edgeKey(vertical = true, t.cellX.toLong, t.cellY.toLong), baseY + rr))
        val ri = rr * w + (w - 1)
        out += ((1, globalLabel(ri), 0L, t.band, px(ri), 0L, 0L,
          edgeKey(vertical = true, t.cellX.toLong + 1L, t.cellY.toLong), baseY + rr))
        rr += 1
      }
      var cc = 0
      while (cc < w) {
        out += ((1, globalLabel(cc), 0L, t.band, px(cc), 0L, 0L,
          edgeKey(vertical = false, t.cellX.toLong, t.cellY.toLong), baseX + cc))
        val bi = (h - 1) * w + cc
        out += ((1, globalLabel(bi), 0L, t.band, px(bi), 0L, 0L,
          edgeKey(vertical = false, t.cellX.toLong, t.cellY.toLong + 1L), baseX + cc))
        cc += 1
      }
      // in-tile adjacency, locally deduped
      val seen = collection.mutable.HashSet.empty[(Long, Long)]
      r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i2 = r * w + c
          def adj(j: Int): Unit = if (px(i2) != px(j)) {
            val la = globalLabel(i2); val lb = globalLabel(j)
            val k = if (la < lb) (la, lb) else (lb, la)
            if (seen.add(k))
              out += ((2, k._1, k._2, t.band, 0.0, 0L, 0L, 0L, 0L))
          }
          if (c + 1 < w) adj(i2 + 1)
          if (r + 1 < h) adj(i2 + w)
          c += 1
        }
        r += 1
      }
      // pixels: gx rides x1, gy rides pos
      i = 0
      while (i < w * h) {
        out += ((3, globalLabel(i), 0L, t.band, px(i),
          0L, baseX + i % w, 0L, baseY + i / w))
        i += 1
      }
      out.iterator
    }.toDF("kind", "label", "label2", "band", "v", "n", "x1", "ek", "pos")
      // cached at the tile plane's own width (floored at the core count)
      .coalesce(math.max(tiles.sparkSession.sparkContext.defaultParallelism,
        tiles.rdd.getNumPartitions))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val comps = perTile.filter(col("kind") === 0)
      .select(col("label"), col("band"), col("v"), col("n"))
    val b = perTile.filter(col("kind") === 1)
      .select(col("label"), col("v"), col("ek"), col("pos"))
    val sidePairs = b.as("a").join(b.as("bb"),
        col("a.ek") === col("bb.ek") && col("a.pos") === col("bb.pos") &&
          col("a.label") < col("bb.label"))
    val mergeEdges = sidePairs.filter(col("a.v") === col("bb.v"))
      .select(col("a.label").as("src"), col("bb.label").as("dst")).distinct()
    val labels = resolveLabels(comps.select(col("label")), mergeEdges, maxIters)

    val regions = comps.join(labels, "label")
      .groupBy(col("band"), col("comp"))
      .agg(min(col("v")).as("v"), sum(col("n")).as("n_px"))

    // region adjacency on FINAL labels (both directions)
    val provAdj = perTile.filter(col("kind") === 2)
        .select(col("label"), col("label2"))
      .unionByName(sidePairs.filter(col("a.v") =!= col("bb.v"))
        .select(col("a.label").as("label"), col("bb.label").as("label2")))
    val adj = provAdj
      .join(labels.withColumnRenamed("comp", "ca"), "label")
      .join(labels.select(col("label").as("label2"), col("comp").as("cb")), "label2")
      .filter(col("ca") =!= col("cb"))
      .select(col("ca"), col("cb"))
    val adjBoth = adj.unionByName(adj.select(col("cb").as("ca"), col("ca").as("cb")))
      .distinct()

    val small = regions.filter(col("n_px") < minPixels)
      .select(col("band"), col("comp"), col("v").as("v_old"))
    val decisions = small
      .join(adjBoth, small("comp") === adjBoth("ca"))
      .join(regions.select(col("comp").as("cb"), col("n_px").as("nb"),
        col("v").as("v_new"), col("band").as("band_b")),
        Seq("cb"))
      .filter(col("band") === col("band_b"))
      .groupBy(col("band"), col("comp"))
      .agg(max(struct(col("nb"), (-col("cb")).as("negc"), col("v_new"))).as("t"))
      .select(col("band"), col("comp"), col("t.v_new").as("v_new"))

    perTile.filter(col("kind") === 3)
      .select(col("label"), col("band"), col("v"),
        col("x1").as("gx"), col("pos").as("gy"))
      .join(labels, "label")
      .join(decisions, Seq("band", "comp"), "left")
      .select(col("gx").cast("int").as("x"), col("gy").cast("int").as("y"),
        col("band"), coalesce(col("v_new"), col("v")).as("v"))
  }

  private def resolveLabels(labelsOnly: DataFrame, edges: DataFrame,
                            maxIters: Int): DataFrame = {
    val spark = labelsOnly.sparkSession
    import spark.implicits._
    val edgeRows = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgeCount = edgeRows.count()
    // memory-derived (was a magic 5M sized to the sandbox): an edge costs
    // ~64 B collected + union-find map entry; budget 5% of driver heap,
    // clamped to [200k, 20M]. Overridable via runtime conf (first) or env
    // for operators who know their driver size.
    val driverLimit = spark.conf.getOption("graft.vectorize.driverEdges")
      .orElse(sys.env.get("GRAFT_VECTORIZE_DRIVER_EDGES")).map(_.toLong)
      .getOrElse {
        val budget = (Runtime.getRuntime.maxMemory() * 0.05).toLong / 64L
        math.min(20000000L, math.max(200000L, budget))
      }
    if (edgeCount <= driverLimit) {
      val es = edgeRows.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = collection.mutable.HashMap.empty[Long, Long]
      def find(a: Long): Long = {
        var x = a
        while (parent.getOrElse(x, x) != x) {
          val p = parent(x)
          parent(x) = parent.getOrElse(p, p)
          x = parent(x)
        }
        x
      }
      es.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val mapping = parent.keysIterator.map(k => (k, find(k))).toSeq
      val mapDf =
        if (mapping.isEmpty) spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("label", "mcomp")
        else mapping.toDF("label", "mcomp")
      labelsOnly
        .join(broadcast(mapDf), Seq("label"), "left")
        .select(col("label"), coalesce(col("mcomp"), col("label")).as("comp"))
    } else {
      // distributed path: alternating star contraction (VERDICT r4 #6 —
      // plain min-label propagation needs diameter-many rounds, and a
      // snake region spanning 10^3 tiles has diameter 10^3; star
      // contraction converges in O(log^2 n) rounds regardless of shape)
      val comp = graft.ops.Dedup.connectedComponents(
        edgeRows.select(col("src"), col("dst")).localCheckpoint(),
        maxIter = maxIters)
      labelsOnly
        .join(comp, labelsOnly("label") === comp("node"), "left")
        .select(col("label"), coalesce(col("component"), col("label")).as("comp"))
    }
  }
}
