package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-organization operators for training-data pipelines (SURVEY
  * §2.11): mixture resampling to a target source distribution and
  * deterministic shard layout. Both are RNG-free — selection and
  * placement derive from a fixed integer mix of the document id, so a
  * re-run (or a different engine) reproduces the exact same corpus. */
object Corpus {

  /** Knuth multiplicative mix of an integer id onto [0, 2^32): the
    * deterministic stand-in for a uniform random draw, shared with
    * [[TextAnalysis.stratifiedSample]] so every sampling op in the
    * engine agrees on what "a random-but-reproducible order" means. */
  private[graft] def mixKey(idCol: Column): Column =
    pmod(idCol * lit(2654435761L) + lit(1013904223L), lit(4294967296L))

  /** Deterministic mixture resampling: downsample so the per-source row
    * counts sit in the exact integer ratio `parts` (e.g. web:3, books:1),
    * keeping as much data as the scarcest source allows. With
    * B = min_s floor(n_s / parts_s), source s keeps exactly parts_s * B
    * rows — all-integer arithmetic, so the quota is bit-reproducible in
    * any engine. Within a source the kept rows are the quota smallest
    * under [[mixKey]] (ties by id): a uniform, RNG-free draw.
    *
    * Sources absent from `parts` are dropped (weight zero).
    *
    * Scale shape: the count aggregation is map-side combined to one row
    * per source; quotas are a broadcast of |sources| rows; the only
    * data-sized operation is the per-source rank window. At 100 TB a
    * source's rank sort is a single-key window — if one source dominates
    * the corpus, trade exactness for a threshold cut on the key
    * (quota/n_s * 2^32), which turns the window into a map-only filter. */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      parts: Map[String, Int]): DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      "mixture parts must be positive integers")
    val spark = df.sparkSession
    import spark.implicits._
    val partsDf = parts.toSeq.toDF(sourceCol, "__part")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .join(partsDf, sourceCol)
    val budget = counts
      .agg(min(floor(col("__n") / col("__part"))).cast("long").as("__b"))
    val quotas = counts.crossJoin(broadcast(budget))
      .select(col(sourceCol), (col("__part") * col("__b")).as("__quota"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(mixKey(col(idCol)), col(idCol))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__quota"))
      .drop("__rk", "__quota")
  }

  /** Concat-and-chop sequence packing — the training-example assembly
    * step of an LLM data pipeline (the public GPT recipe): order each
    * shard's documents deterministically (by [[mixKey]], the same
    * pseudo-random permutation [[shardAssign]] uses), conceptually
    * concatenate their token streams, and chop into fixed
    * `windowTokens`-sized training windows. Documents cross window
    * boundaries (that is the point — zero padding waste); the output is
    * one row per (window, document segment): which slice of which doc
    * lands at which offset of which training example.
    *
    * The whole computation is a per-shard prefix sum (one window
    * function over doc TOKEN COUNTS, not tokens) plus a per-doc explode
    * into the 1 + n/W windows it spans — output volume is
    * n_docs + total_tokens/W rows, linear, and no shuffle ever carries
    * text. Exactly reproducible across engines: ordering is the integer
    * mix, arithmetic is integer token counts. */
  def packWindows(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, nShards: Int): DataFrame = {
    require(windowTokens > 0 && nShards > 0,
      "windowTokens and nShards must be positive")
    val W = windowTokens.toLong
    val keyed = df
      .select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__key", mixKey(col(idCol)))
      .withColumn("shard", pmod(col("__key"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    // token-stream span of each doc inside its shard's concatenation
    val spans = keyed
      .withColumn("__end", sum(col("__n")).over(w))
      .withColumn("__start", col("__end") - col("__n"))
    // totals fit doubles exactly far beyond any real corpus (2^53 tokens);
    // floor-div via double stays integer-exact
    def fdiv(c: Column): Column = floor(c / lit(W.toDouble)).cast("long")
    spans
      .select(col("shard"), col(idCol), col("__start"), col("__end"),
        explode(sequence(fdiv(col("__start")), fdiv(col("__end") - 1)))
          .as("win"))
      .withColumn("__s", greatest(col("__start"), col("win") * W))
      .withColumn("__e", least(col("__end"), (col("win") + 1) * W))
      .select(col("shard"), col("win"), col(idCol),
        (col("__s") - col("win") * W).as("win_offset"),
        (col("__e") - col("__s")).as("n_tokens"))
  }

  /** Deterministic training-shard layout: every row gets a (shard, pos)
    * placement — shard = mixKey(id) % nShards, pos = dense rank of the
    * key within the shard — which is the file/offset assignment a
    * sharded training-data writer needs, reproducible across runs and
    * engines (no RNG, no partition-order dependence). The key acts as a
    * global pseudo-random permutation, so each shard is an unbiased
    * sample of the corpus and reading shards in pos order visits the
    * corpus in shuffled order — exactly what a training loader wants.
    *
    * One shuffle (by shard) + an in-shard sort. At 100 TB size nShards
    * to the target file count (thousands), which also bounds the
    * per-shard sort; the demo uses a small count to keep the result
    * inspectable. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val keyed = df.select(col(idCol), mixKey(col(idCol)).as("__key"))
      .withColumn("shard", pmod(col("__key"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    keyed.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col(idCol))
  }
}
