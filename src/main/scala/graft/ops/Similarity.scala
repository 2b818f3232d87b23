package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Exactness strategy: embeddings are quantized to integer milli-units
  * (round(x*1000)); integer dot products are then exact in any engine and
  * order-independent, so top-k results (ties broken by id) are
  * reproducible bit-for-bit. The float cosine path exists alongside for
  * real workloads (brute-force baseline + cell-bucketed scale path).
  */
object Similarity {

  /** array<float> → array<long> milli-quantized. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(1000.0)).cast("long"))

  /** Integer dot product of two quantized vectors (codegen'd builtins). */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact top-k by quantized dot product, probes broadcast (same scale
    * shape as KnnJoin: the big target side is never shuffled; the final
    * window runs on P×k×partitions rows).
    */
  def annTopK(embeddings: DataFrame, probeMaxId: Long, k: Int): DataFrame = {
    val q = embeddings.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val probes = q.filter(col("vec_id") < probeMaxId)
      .select(col("vec_id").as("query_id"), col("q").as("pq"))
    val scored = q.join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dotQ(col("pq"), col("q")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Float cosine similarity (real-workload path; not oracle-checked —
    * trig-free but accumulation-order sensitive at the last ulp).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Cosine brute-force top-k (baseline for the ANN variants). */
  def cosineTopK(embeddings: DataFrame, probeMaxId: Long, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val probes = e.filter(col("vec_id") < probeMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("pe"))
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("pe"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN (scale path): random-hyperplane signatures from the
    * quantized vectors — sign of dot with deterministic ±1 pattern vectors
    * (seeded by dimension index parity mixes). Neighbor candidates share a
    * signature bucket; exact re-score inside buckets. Approximate recall,
    * exact scoring — rows-only check.
    */
  def lshBucketTopK(embeddings: DataFrame, numPlanes: Int, k: Int): DataFrame = {
    val q = embeddings.select(col("vec_id"), quantize(col("embedding")).as("q"))
    // plane p weight for dim i = +1 if md5-ish mix parity, else -1 (deterministic)
    val sigBits = (0 until numPlanes).map { p =>
      val signed = aggregate(
        zip_with(col("q"), sequence(lit(0), size(col("q")) - 1),
          (x, i) => when(pmod(i * lit(2654435761L) + lit(p * 40503L), lit(2)) === 0, x).otherwise(-x)),
        lit(0L), (acc, v) => acc + v)
      when(signed > 0, lit(1L << p)).otherwise(lit(0L))
    }
    val bucketed = q.withColumn("bucket", sigBits.reduce(_ + _))
    val pairs = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        dotQ(col("a.q"), col("b.q")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
