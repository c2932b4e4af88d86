package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the verified near-duplicate pair graph
  * (SURVEY.md §2) — the canonical distributed-graph kernels, expressed
  * relationally so Catalyst plans them (no external graph library).
  * The edge list comes from the MinHash path (dd02): |edges| ∝ true
  * near-dups, so even at corpus scale the graph frames stay tiny
  * relative to the input.
  */
object Graph {

  /** Oriented (d1 < d2) verified near-dup edges. Cached: the triangle
    * query references this frame three times (and the degree query
    * twice) — without the cache each reference re-executes the whole
    * minhash+verify chain inside one job. */
  private def edges(s: SparkSession, d: String): DataFrame =
    Dedup.dd02MinhashLsh(s, d).select(col("d1"), col("d2")).cache()

  /** gr01: triangle count — the standard oriented-wedge formulation:
    * each triangle a<b<c is counted exactly once as the wedge
    * (a,b)+(b,c) closed by (a,c). Two equi-joins + one count; no
    * quadratic neighborhood expansion. */
  def gr01TriangleCount(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    val e1 = e.select(col("d1").as("a"), col("d2").as("b"))
    val e2 = e.select(col("d1").as("b2"), col("d2").as("c2"))
    val e3 = e.select(col("d1").as("a3"), col("d2").as("c3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** gr02: degree distribution — how many docs have k near-duplicates.
    * Undirected degree = occurrences on either edge end. */
  def gr02DegreeDist(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    e.select(col("d1").as("doc"))
      .unionByName(e.select(col("d2").as("doc")))
      .groupBy(col("doc")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
  }
}
