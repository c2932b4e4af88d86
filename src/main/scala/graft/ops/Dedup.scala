package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines
  * (SURVEY.md §2). Three cost tiers:
  *  - dd01 exact:   one hash-groupBy — linear, the cheap first pass.
  *  - dd04 exact n-gram Jaccard: shingle inverted-index self-join — the
  *    join key (shingle) IS the blocking, so only documents sharing a
  *    shingle ever meet; exact but shuffle-heavy, for moderate corpora.
  *  - dd02 MinHash+LSH / dd03 SimHash (see below): sketch first, then
  *    join only within LSH band buckets — the 100 TB path, candidate
  *    set ∝ true near-dups, not corpus².
  */
object Dedup {

  /** dd01: exact dedup — group identical normalized text, keep min id. */
  def dd01Exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(lower(trim(col("text")))).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Distinct 3-token shingles per document: (doc_id, shingle). */
  private[ops] def shingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("tk", split(trim(col("text")), " "))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, size(tk)-2),
          |  i -> concat(element_at(tk,i), ' ', element_at(tk,i+1), ' ', element_at(tk,i+2)))"""
          .stripMargin))).as("s"))

  /** dd04: exact trigram-shingle Jaccard near-dup pairs (≥ 0.6).
    * shared(a,b) comes from the inverted-index self-join; |A∪B| =
    * |A|+|B|-shared, all integer arithmetic so both engines agree
    * bit-exactly before the final division. */
  def dd04NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(s, d).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("d1"), col("s"))
    val b = sh.select(col("doc_id").as("d2"), col("s"))
    val shared = a.join(b, Seq("s")).filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), Seq("d1"))
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), Seq("d2"))
      .withColumn("jaccard",
        round(col("shared") * 1.0 / (col("n1") + col("n2") - col("shared")), 4))
      .filter(col("jaccard") >= 0.6)
      .select(col("d1"), col("d2"), col("jaccard"))
  }
}
