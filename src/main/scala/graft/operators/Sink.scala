package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Corpus output shaping (beyond-reference, SURVEY.md §2.4): write the
  * curated corpus as partitioned parquet laid out for training reads.
  *
  * The two failure modes this prevents at 100 TB:
  *
  *  - **small-file explosion**: a naive `df.write.partitionBy(split,
  *    lang)` emits one file per (task × partition-combo) — with 10k tasks
  *    and 20 combos that is 200k files per run, which kills both the
  *    writing job's driver (file commit protocol) and every later
  *    listing. Repartitioning BY the partition columns first routes each
  *    combo to one task → one file per combo, re-split only by
  *    `maxRecordsPerFile` (the knob that keeps individual files
  *    readable/seekable);
  *  - **compression loss**: rows sorted by `sortCols` within each task
  *    (e.g. by language then doc id, or by a cluster/domain key) compress
  *    2–3× better in parquet's RLE/dictionary encodings than shuffled
  *    rows, and give downstream readers locality for range pruning.
  *
  * A single giant combo serializes into one task; pass `shards > 1` to
  * spread every combo over that many tasks/files (file counts stay
  * bounded at combos × shards). The shard is derived from a CONTENT hash
  * of the row, never from partition/row position: a positional salt (the
  * SPARK-23207 round-robin hazard) re-routes rows when a stage retries,
  * silently duplicating some and dropping others mid-write. Identical
  * duplicate rows co-locate — acceptable, still bounded.
  */
object Sink {

  def writeCorpus(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L,
      shards: Int = 1,
      mode: String = "error"): Unit = {
    require(partitionCols.nonEmpty, "writeCorpus needs at least one partition column")
    require(maxRecordsPerFile > 0, s"maxRecordsPerFile must be positive")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(!df.columns.contains("__shard"), "'__shard' is reserved by writeCorpus")
    // shard key: content hash over the HASHABLE columns only — xxhash64
    // rejects map-typed input (and maps nested in arrays/structs), and a
    // metadata map column must not break the write
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    // EXCLUDE the partition columns from the shard key: they are constant
    // within a combo, so hashing them contributes nothing — and if they
    // were all that remained, every row of a combo would land in one
    // shard, silently recreating the hot-combo serialization that
    // `shards` exists to prevent
    val shardCols = df.schema.fields
      .filter(f => hashable(f.dataType) && !partitionCols.contains(f.name))
      .map(_.name).toSeq
    require(shards == 1 || shardCols.nonEmpty,
      "writeCorpus(shards > 1) needs at least one non-map, non-partition column " +
        "to derive the shard from (add a row id)")
    val routed =
      if (shards == 1) df.repartition(partitionCols.map(c => col(s"`$c`")): _*)
      else df
        .withColumn("__shard",
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64(shardCols.map(c => col(s"`$c`")): _*),
            org.apache.spark.sql.functions.lit(shards.toLong)))
        .repartition((partitionCols :+ "__shard").map(c => col(s"`$c`")): _*)
        .drop("__shard")
    // prefix the sort with the partition columns: the V1 dynamic-partition
    // write requires child ordering by partitionCols and would otherwise
    // insert its OWN Sort(partitionCols) above this one — an external sort
    // whose stability for equal keys is not contractual, which could
    // silently undo the sortCols clustering at exactly the spill-heavy
    // scale it targets. With the prefix, this sort satisfies the writer's
    // required ordering and no extra sort is inserted (partitionCols are
    // constant within a routed task, so the effective order is unchanged).
    val sorted =
      if (sortCols.isEmpty) routed
      else routed.sortWithinPartitions(
        (partitionCols ++ sortCols.filterNot(partitionCols.contains))
          .map(c => col(s"`$c`")): _*)
    sorted.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Morton (Z-order) interleave column over 2+ numeric dimensions: each
    * value min-max scales to a `bits`-bit bucket (1-row stats frame,
    * broadcast back), and bucket bits interleave so that rows close in
    * EVERY dimension get close z-values. All Column-level shifts/masks —
    * codegen'd, no UDF. Nulls and zero-range dimensions bucket to 0. */
  /** Write `df` as a BUCKETED (and optionally per-bucket-sorted) parquet
    * table: rows are hash-routed into `nBuckets` files per partition by
    * `bucketCols`, and the bucketing metadata is recorded in the catalog.
    * The payoff is the 100 TB one: a join or aggregation keyed on the
    * bucket columns between two tables bucketed the SAME way needs NO
    * shuffle at all — Spark proves co-partitioning from the metadata and
    * plans an exchange-free SortMergeJoin (SinkSpec asserts this on the
    * plan). This is the persisted form of `repartition(key)`: pay the
    * shuffle once at write time, then every downstream job on the key —
    * the fact-table pattern for dimension joins run daily at fleet
    * scale. `sortCols` additionally sorts within each bucket file
    * (faster merge joins, better parquet encodings — the
    * [[writeCorpus]] compression argument).
    *
    * Bucket counts must match across join sides for the no-shuffle
    * proof; pick a count that divides your executor parallelism. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def withZOrder(df: DataFrame, zCols: Seq[String], bits: Int = 12,
      out: String = "__z"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-ordering needs at least 2 dimensions " +
      "(one dimension is a plain sort)")
    require(bits >= 1 && zCols.size * bits <= 63,
      s"${zCols.size} cols x $bits bits must fit a signed long")
    require(!df.columns.contains(out), s"'$out' already exists")
    zCols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column $c must be numeric (hash or bucket other types first)")
    }
    val aggs = zCols.flatMap(c => Seq(
      min(col(s"`$c`").cast("double")).as(s"__zmin_$c"),
      max(col(s"`$c`").cast("double")).as(s"__zmax_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val maxBucket = (1L << bits) - 1
    val n = zCols.size
    val buckets = zCols.map { c =>
      val v = col(s"`$c`").cast("double")
      val lo = col(s"__zmin_$c")
      val rng = col(s"__zmax_$c") - lo
      when(v.isNull || rng.isNull || rng === 0.0, lit(0L))
        .otherwise(least(lit(maxBucket),
          floor((v - lo) / rng * maxBucket.toDouble).cast("long")))
    }
    val z = (0 until bits).flatMap { b =>
      (0 until n).map { i =>
        shiftleft(shiftright(buckets(i), b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ bitwiseOR _)
    df.crossJoin(broadcast(stats)) // 1-row stats: a broadcast dim
      .withColumn(out, z)
      .drop(zCols.flatMap(c => Seq(s"__zmin_$c", s"__zmax_$c")): _*)
  }

  /** Z-ordered parquet write: range-partition and sort by the Morton
    * value, so every output file covers a small BOX in the z-dimensions
    * instead of a stripe of one dimension (or everything, for a hash
    * layout). Parquet min/max footer stats then prune files/row-groups
    * for predicates on ANY z-dimension — the multi-dimensional
    * data-skipping layout a single-column sort cannot give. SinkSpec
    * measures the claim: mean per-file bounding-box area vs a hash
    * layout. Cost: one stats pass + one range exchange at write time —
    * paid once, saved on every read. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 12, numFiles: Int = 32, mode: String = "error"): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    withZOrder(df, zCols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}
