package graft.geo

/** Immutable STR-packed R-tree over (bbox, payload id) entries.
  *
  * Serves the role the reference delegates to SQLite's spatial index
  * (reference: buteo/core_vector/core_vector_index.py:121-179,
  * `CreateSpatialIndex` at :170; used by buteo/vector/intersect.py:51-52).
  * Built once on the driver over the broadcast (small) polygon side of a
  * spatial join, queried per probe row on executors. Serializable.
  */
final class RTree private (
    nodeBoxes: Array[Double],   // 4 per node: xMin, xMax, yMin, yMax
    nodeFirst: Array[Int],      // first child node idx, or ~firstEntry for leaves
    nodeCount: Array[Int],      // child / entry count
    entryIds: Array[Int],       // payload ids in leaf order
    entryBoxes: Array[Double],  // 4 per entry, in leaf order
    root: Int) extends Serializable {

  /** Ids of all entries whose bbox intersects the query box (closed bounds). */
  def query(qxMin: Double, qxMax: Double, qyMin: Double, qyMax: Double): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val stack = new java.util.ArrayDeque[Int]()
    if (nodeCount.nonEmpty) stack.push(root)
    while (!stack.isEmpty) {
      val n = stack.pop()
      val b = n * 4
      val hit = !(nodeBoxes(b + 1) < qxMin || nodeBoxes(b) > qxMax ||
                  nodeBoxes(b + 3) < qyMin || nodeBoxes(b + 2) > qyMax)
      if (hit) {
        val first = nodeFirst(n)
        if (first < 0) { // leaf
          val e0 = ~first
          var i = 0
          while (i < nodeCount(n)) {
            val eb = (e0 + i) * 4
            if (!(entryBoxes(eb + 1) < qxMin || entryBoxes(eb) > qxMax ||
                  entryBoxes(eb + 3) < qyMin || entryBoxes(eb + 2) > qyMax))
              out += entryIds(e0 + i)
            i += 1
          }
        } else {
          var i = 0
          while (i < nodeCount(n)) { stack.push(first + i); i += 1 }
        }
      }
    }
    out.toArray
  }

  def queryPoint(x: Double, y: Double): Array[Int] = query(x, x, y, y)
}

object RTree {
  val Fanout = 16

  /** Sort-Tile-Recursive bulk load. `boxes(i)` is the bbox of payload id i. */
  def build(boxes: Array[BBox]): RTree = {
    val n = boxes.length
    if (n == 0)
      return new RTree(Array(0.0, 0.0, 0.0, 0.0), Array(~0), Array(0),
        Array.empty, Array.empty, 0)

    // STR: sort by center x, slice, sort slices by center y.
    val ids = Array.range(0, n)
    val byX = ids.sortBy(i => boxes(i).centerX)
    val nLeaves = math.ceil(n.toDouble / Fanout).toInt
    val nSlices = math.ceil(math.sqrt(nLeaves.toDouble)).toInt
    val sliceSize = math.ceil(n.toDouble / nSlices).toInt
    val ordered = byX.grouped(sliceSize).flatMap(_.sortBy(i => boxes(i).centerY)).toArray

    val nodeBoxes = new scala.collection.mutable.ArrayBuffer[Double]()
    val nodeFirst = new scala.collection.mutable.ArrayBuffer[Int]()
    val nodeCount = new scala.collection.mutable.ArrayBuffer[Int]()

    def addNode(b: BBox, first: Int, count: Int): Int = {
      nodeBoxes ++= Seq(b.xMin, b.xMax, b.yMin, b.yMax)
      nodeFirst += first; nodeCount += count
      nodeFirst.length - 1
    }

    // leaves
    var level = new scala.collection.mutable.ArrayBuffer[Int]()
    var off = 0
    while (off < n) {
      val cnt = math.min(Fanout, n - off)
      var b = boxes(ordered(off))
      var i = 1
      while (i < cnt) { b = b.union(boxes(ordered(off + i))); i += 1 }
      level += addNode(b, ~off, cnt)
      off += cnt
    }
    // upper levels (children of one parent are contiguous by construction)
    while (level.length > 1) {
      val next = new scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < level.length) {
        val cnt = math.min(Fanout, level.length - i)
        var b = BBox(nodeBoxes(level(i) * 4), nodeBoxes(level(i) * 4 + 1),
                     nodeBoxes(level(i) * 4 + 2), nodeBoxes(level(i) * 4 + 3))
        var j = 1
        while (j < cnt) {
          val c = level(i + j) * 4
          b = b.union(BBox(nodeBoxes(c), nodeBoxes(c + 1), nodeBoxes(c + 2), nodeBoxes(c + 3)))
          j += 1
        }
        next += addNode(b, level(i), cnt)
        i += cnt
      }
      level = next
    }
    val entryBoxes = ordered.flatMap(i =>
      Array(boxes(i).xMin, boxes(i).xMax, boxes(i).yMin, boxes(i).yMax))
    new RTree(nodeBoxes.toArray, nodeFirst.toArray, nodeCount.toArray,
      ordered, entryBoxes, level(0))
  }
}
