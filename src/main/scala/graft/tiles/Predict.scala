package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Tiled inference with overlap merge — the reference's predict_array
  * lifecycle (reference: buteo/array/patches/prediction.py:30-186,
  * offsets :103-112, edge weights :143-147, weighted merge :166-181;
  * SURVEY.md §3.3):
  *
  *   1. extract patches at several offsets (here: the tile grid itself
  *      plus half-tile-shifted passes) — pure tile reads + halo pads,
  *   2. run the model per patch inside `mapPartitions`-style tile code,
  *   3. re-key every predicted pixel by its absolute position with an
  *      edge-distance weight,
  *   4. merge overlapping predictions per pixel (weighted median).
  *
  * One shuffle at the merge; the model is a broadcast pure function.
  */
object Predict {

  /** Run `model` over every pixel's padded neighborhood at `offsets`
    * half-tile passes and weighted-median-merge the overlapping outputs.
    * Output: (x, y, band, v_merged, n_preds).
    *
    * `model`: (paddedPlane, padWidth, x, y) => prediction for the pixel at
    * padded coords (x, y) — stands in for a neural net over the patch.
    */
  def predictAndMerge(tiles: Dataset[Tile], tileSize: Int, radius: Int,
                      passes: Int)
                     (model: (Array[Double], Int, Int, Int) => Double): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    // each pass p produces per-pixel predictions; uniform weights here —
    // real edge-distance weights (prediction.py:143-147) plug into the
    // same column (the weighted path is covered by patch_merge_wmedian)
    val preds = (0 until passes).map { p =>
      val weight = 1.0
      TileOps.convolvePad(tiles, radius).flatMap { case (t, pad, pw, _) =>
        val baseX = t.cellX * tileSize; val baseY = t.cellY * tileSize
        val out = new Array[(Int, Int, Int, Double, Double)](t.w * t.h)
        var r = 0
        while (r < t.h) {
          var c = 0
          while (c < t.w) {
            val v = model(pad, pw, c + radius + p, r + radius + p)
            out(r * t.w + c) = (baseX + c, baseY + r, t.band, v, weight)
            c += 1
          }
          r += 1
        }
        out.iterator
      }.toDF("x", "y", "band", "v", "weight")
    }.reduce(_ unionByName _)
    val wm = udaf(graft.ops.Merging.weightedMedian)
    preds.groupBy("x", "y", "band")
      .agg(wm(col("v"), col("weight")).as("v_merged"), count(lit(1)).as("n_preds"))
  }
}
