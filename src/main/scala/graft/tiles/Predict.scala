package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Tiled inference with overlap merge — the reference's predict_array
  * lifecycle (reference: buteo/array/patches/prediction.py:30-186,
  * offsets :103-112 via patches/util.py:68-98, edge weights :143-147 via
  * patches/util.py:11-66, weighted merge :166-181; SURVEY.md §3.3):
  *
  *   1. every pass p re-tiles the raster at a grid shifted by
  *      round(p/passes * tileSize) in both axes (half-tile offsets for
  *      passes=2, thirds for passes=3, ...),
  *   2. the model predicts each covered pixel from its patch context;
  *      the prediction is keyed at the pixel's ABSOLUTE position — the
  *      pass shifts only the patch window, never the evaluated pixel
  *      (prediction.py:153-154 places each offset pass back at absolute
  *      positions before merging),
  *   3. each prediction carries an edge-distance weight derived from the
  *      pixel's position WITHIN the pass's patch (util.py:11-66),
  *   4. overlapping predictions merge per absolute pixel (weighted
  *      median).
  *
  * Distribution shape: ONE halo exchange (convolvePad) feeds every pass —
  * all (pixel, pass) predictions are emitted from a single flatMap — and
  * one shuffle merges them. Pixels a pass's grid does not cover (leading
  * `offset` rows/cols + the trailing partial patch) contribute no
  * prediction for that pass; with borderCheck (the reference default)
  * three extra far-edge-anchored passes cover the trailing area
  * (prediction.py:105-112).
  */
object Predict {

  /** Edge-distance patch weights — exact port of
    * reference buteo/array/patches/util.py:11-66 (_get_kernel_weights):
    * weight falls off linearly within `edgeDistance` of a patch edge,
    * floor epsilon=1e-7. Row-major tileSize×tileSize plane.
    */
  def kernelWeights(tileSize: Int, edgeDistance: Int): Array[Double] = {
    require(edgeDistance >= 0 && edgeDistance < tileSize / 2,
      s"edgeDistance $edgeDistance must be in [0, tileSize/2)")
    val maxDist = edgeDistance * 2.0
    val out = new Array[Double](tileSize * tileSize)
    var iy = 0
    while (iy < tileSize) {
      var ix = 0
      while (ix < tileSize) {
        val vy = math.max(edgeDistance - iy, 0).toDouble +
          math.max((1 + edgeDistance) - (tileSize - iy), 0).toDouble
        val vx = math.max(edgeDistance - ix, 0).toDouble +
          math.max((1 + edgeDistance) - (tileSize - ix), 0).toDouble
        var v = if (maxDist == 0.0) 1.0 else (maxDist - math.abs(vy + vx)) / maxDist
        if (v <= 0.0) v = 1e-7
        out(iy * tileSize + ix) = v
        ix += 1
      }
      iy += 1
    }
    out
  }

  /** Pass grid offsets — port of patches/util.py:68-98 (_get_offsets):
    * pass 0 anchors at 0, pass p at round(p/passes * tileSize).
    */
  def passOffsets(tileSize: Int, passes: Int): Array[Int] = {
    require(passes >= 1 && tileSize >= passes, s"bad passes=$passes for tileSize=$tileSize")
    (0 until passes).map(p => math.round(p.toDouble / passes * tileSize).toInt).toArray
  }

  /** Full pass list including the reference's border_check offsets
    * (prediction.py:105-112): the symmetric (o, o) grids from
    * [[passOffsets]], plus — when any pass grid leaves a trailing
    * partial patch in either dimension — three far-edge anchors
    * (0, W−ts), (H−ts, 0), (H−ts, W−ts) so the trailing rows/cols get
    * predictions too. Pairs are (offsetY, offsetX), reference order.
    * The reference does not dedupe coincident offsets (its own TODO at
    * prediction.py:108); neither do we.
    */
  def passOffsetPairs(tileSize: Int, passes: Int, width: Int, height: Int,
                      borderCheck: Boolean): Array[(Int, Int)] = {
    val sym = passOffsets(tileSize, passes).map(o => (o, o))
    if (!borderCheck) return sym
    val needed = sym.exists { case (oy, ox) =>
      (height - oy) % tileSize != 0 || (width - ox) % tileSize != 0
    }
    if (!needed || width < tileSize || height < tileSize) sym
    else sym ++ Array((0, width - tileSize), (height - tileSize, 0),
      (height - tileSize, width - tileSize))
  }

  /** Run `model` over every pixel at `passes` shifted patch grids and
    * weighted-median-merge the overlapping predictions per absolute
    * pixel. Output: (x, y, band, v_merged, n_preds).
    *
    * `model`: (paddedPlane, padWidth, px, py, relX, relY) => prediction
    * for the pixel at padded coords (px, py), where (relX, relY) is the
    * pixel's position within the current pass's patch — the stand-in for
    * a neural net consuming the patch crop.
    *
    * Weights are quantized to round(w * 1e8) before the merge so the
    * cumulative-weight comparison in the weighted median is exact
    * integer math (deterministic across engines).
    */
  def predictAndMerge(tiles: Dataset[Tile], spec: RasterSpec, radius: Int,
                      passes: Int, edgeDistance: Int = 2,
                      borderCheck: Boolean = true)
                     (model: (Array[Double], Int, Int, Int, Int, Int) => Double): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val ts = spec.tileSize
    val offs = passOffsetPairs(ts, passes, spec.width, spec.height, borderCheck)
    val kw = kernelWeights(ts, edgeDistance)
    // per-pass coverage bound: patches tile [off, off + floor((dim-off)/ts)*ts)
    val covX = offs.map { case (_, ox) => ox + ((spec.width - ox) / ts) * ts }
    val covY = offs.map { case (oy, _) => oy + ((spec.height - oy) / ts) * ts }

    val preds = TileOps.convolvePad(tiles, radius).flatMap { case (t, pad, pw, _) =>
      val baseX = t.cellX * ts; val baseY = t.cellY * ts
      val out = collection.mutable.ArrayBuffer[(Int, Int, Int, Double, Double)]()
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val ax = baseX + c; val ay = baseY + r
          var p = 0
          while (p < offs.length) {
            val (oy, ox) = offs(p)
            if (ax >= ox && ax < covX(p) && ay >= oy && ay < covY(p)) {
              val relX = (ax - ox) % ts; val relY = (ay - oy) % ts
              val v = model(pad, pw, c + radius, r + radius, relX, relY)
              val wq = math.round(kw(relY * ts + relX) * 1e8).toDouble
              out += ((ax, ay, t.band, v, wq))
            }
            p += 1
          }
          c += 1
        }
        r += 1
      }
      out.iterator
    }.toDF("x", "y", "band", "v", "weight")

    val wm = udaf(graft.ops.Merging.weightedMedian)
    preds.groupBy("x", "y", "band")
      .agg(wm(col("v"), col("weight")).as("v_merged"), count(lit(1)).as("n_preds"))
  }
}
