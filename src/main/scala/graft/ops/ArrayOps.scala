package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-payload layout utilities — the reference's channel-axis
  * transposes (reference: buteo/array/utils_array.py:7-60) re-expressed
  * as Catalyst column functions over flat arrays (codegen'd builtins, no
  * UDF).
  */
object ArrayOps {

  /** Flat channel-first (c×h×w) → channel-last (h×w×c):
    * out[(y·w + x)·c + ch] = in[ch·h·w + y·w + x].
    */
  def channelFirstToLast(arr: Column, c: Int, h: Int, w: Int): Column = {
    val n = c * h * w
    transform(sequence(lit(0), lit(n - 1)), i => {
      val ch = pmod(i, lit(c))
      val pix = ((i - ch) / lit(c)).cast("int")
      element_at(arr, (ch * lit(h * w) + pix + lit(1)).cast("int"))
    })
  }

  /** Flat channel-last (h×w×c) → channel-first (c×h×w):
    * out[ch·h·w + y·w + x] = in[(y·w + x)·c + ch].
    */
  def channelLastToFirst(arr: Column, c: Int, h: Int, w: Int): Column = {
    val n = c * h * w
    val hw = h * w
    transform(sequence(lit(0), lit(n - 1)), i => {
      val ch = ((i - pmod(i, lit(hw))) / lit(hw)).cast("int")
      val pix = pmod(i, lit(hw))
      element_at(arr, (pix * lit(c) + ch + lit(1)).cast("int"))
    })
  }

  /** Codegen'd single-pass variants (graft.expr.ChannelTransposeExpr):
    * one tight array permutation instead of a per-element
    * transform+element_at expression tree — the hot-path form for long
    * payload arrays (requires `GraftFunctions.register`).
    */
  def channelFirstToLastFast(arr: Column, c: Int, h: Int, w: Int): Column =
    call_function("channel_transpose", arr, lit(c), lit(h), lit(w), lit(true))

  def channelLastToFirstFast(arr: Column, c: Int, h: Int, w: Int): Column =
    call_function("channel_transpose", arr, lit(c), lit(h), lit(w), lit(false))
}
