package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding boundary (reference C20: generate_embeddings at
  * /root/reference/magictables/utils.py:179-242 — dead code there, calling
  * litellm/Jina over HTTP). The environment is zero-egress, so the default
  * is a deterministic feature-hashing embedder; an online client plugs in
  * behind the same trait.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Feature hashing ("hashing trick"): token t lands in bucket
  * md5(t).take(8) mod dim with count weight, L2-normalized. Deterministic,
  * vocabulary-free, identical on driver and executors — and reproducible in
  * ANSI SQL, so the distributed variant is oracle-checkable. */
final class FeatureHashEmbedder(val dim: Int = 16) extends Embedder {
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    // Locale.ROOT: default-locale lowercasing (tr-TR dotless i) would
    // diverge from Spark's lower() in the distributed variant
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).foreach { t =>
      v(FeatureHashEmbedder.bucket(t, dim)) += 1f
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm == 0) v else v.map(x => (x / norm).toFloat)
  }
}

object FeatureHashEmbedder {
  /** Bucket of a token: first 8 md5 hex chars as an int, mod dim —
    * the exact arithmetic DuckDB reproduces with
    * ('0x' || substring(md5(t), 1, 8))::BIGINT % dim. */
  def bucket(token: String, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    val hex8 = md.take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex8, 16) % dim).toInt
  }

  /** Distributed raw-count variant: per-doc token counts per hash bucket as
    * columns h0..h{dim-1} (columns, not an array, so the oracle compare is
    * positional-free). One token-stream explode + one map-side-combinable
    * aggregation; documents with no tokens keep a zero row. */
  def hashCountColumns(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .withColumn("__b", conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long") % dim)
    val aggs = (0 until dim).map(d =>
      sum(when(col("__b") === d, 1L).otherwise(0L)).as(s"h$d"))
    val counts = toks.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    df.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol) +: (0 until dim).map(d => coalesce(col(s"h$d"), lit(0L)).as(s"h$d")): _*)
  }

  /** Distributed normalized-embedding variant: array<float> column matching
    * [[FeatureHashEmbedder.embed]] exactly. */
  def hashEmbedding(df: DataFrame, idCol: String, textCol: String, dim: Int,
      outCol: String = "embedding"): DataFrame = {
    val counts = hashCountColumns(df, idCol, textCol, dim)
    val arr = array((0 until dim).map(d => col(s"h$d").cast("float")): _*)
    val normed = {
      val n = sqrt(aggregate(transform(arr, x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, v) => a + v))
      when(n === 0, arr).otherwise(transform(arr, x => (x.cast("double") / n).cast("float")))
    }
    counts.select(col(idCol), normed.as(outCol))
  }
}
