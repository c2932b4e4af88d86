package graft.ops

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (SURVEY.md §2).
  *
  * ss01 is the exact baseline: broadcast the (small) query set against
  * the full corpus — one scan, no shuffle of the corpus, cosine runs in
  * the codegen'd `CosineSim` expression, top-k via per-partition
  * row_number. At 100 TB the corpus side stays partition-local.
  *
  * ss02 is the scale path: 16-bit random-hyperplane LSH. Corpus and
  * queries hash to sign-pattern buckets; candidate generation is a
  * bucket equi-join (shuffle on bucket key ∝ collisions, never corpus²).
  */
object Similarity {

  private val dim = 64
  private val nPlanes = 4

  /** Deterministic Gaussian hyperplanes (seed 42), inlined as SQL
    * literals so the same planes are reproducible in any engine. */
  private[graft] val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Signed dot-product bit for one hyperplane, via higher-order
    * functions (stays inside codegen; no UDF). */
  private def planeBit(p: Int, embCol: String): Column = {
    val arr = planes(p).map(v => s"CAST($v AS DOUBLE)").mkString("array(", ",", ")")
    val dot = expr(
      s"aggregate(sequence(0, ${dim - 1}), CAST(0.0 AS DOUBLE), " +
        s"(acc, i) -> acc + element_at($embCol, i+1) * element_at($arr, i+1))")
    when(dot >= 0, lit("1")).otherwise(lit("0"))
  }

  /** Sign-pattern LSH bucket id (nPlanes bits) for an embedding column. */
  private[graft] def bucket(embCol: String): Column =
    concat((0 until nPlanes).map(planeBit(_, embCol)): _*)

  /** ss01: exact brute-force cosine top-5 for query vectors vec_id<10. */
  def ss01BruteTopk(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(q_emb, embedding)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rk"))
  }

  /** ss02: LSH-bucketed top-5 — same output shape as ss01 but neighbors
    * are drawn only from the query's own LSH bucket. */
  def ss02LshTopk(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d).withColumn("bkt", bucket("embedding"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"), col("bkt"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    emb.join(broadcast(queries), Seq("bkt"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(q_emb, embedding)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rk"))
  }
}
