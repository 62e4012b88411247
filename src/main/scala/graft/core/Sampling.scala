package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / mixing for training-data pipelines.
  *
  * The workhorse is HASH-based (not RNG-based) sampling: membership is
  * a pure function of the row key, so the sample is reproducible
  * across runs, engines, partitionings and cluster sizes — the
  * property a 100 TB pipeline needs for resumable / auditable corpus
  * construction (an RNG sample changes whenever partitioning does).
  * Implementation: keep a row iff the first 8 hex digits of
  * md5(salt ‖ key) fall below floor(fraction · 2³²) — md5 hex compares
  * lexicographically in value order, and md5 is available in every
  * engine, so the predicate is directly oracle-checkable.
  */
object Sampling {

  // "g" sorts above every hex digit, so fraction 1.0 keeps all rows even
  // through a pure string comparison (floor(1.0·2³²) would render as the
  // 9-char "100000000", which sorts BELOW most 8-char prefixes)
  private def hexThreshold(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else f"${math.floor(fraction * 4294967296.0).toLong}%08x"

  /** Deterministic sample of `fraction` of rows, keyed on `keyCol`.
    * Same (key, salt, fraction) → same decision everywhere. Distinct
    * salts draw independent samples. */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"deterministicSample: fraction must be in [0, 1], got $fraction")
    if (fraction >= 1.0) df
    else df.filter(
      substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8)
        < lit(hexThreshold(fraction)))
  }

  /** Deterministic weighted corpus mix: each source is sampled at its
    * fraction (hash-keyed on `keyCol`, salted per source name so the
    * draws are independent) and tagged with a `source` column, then
    * unioned. The standard dataset-mixing shape for assembling a
    * training corpus from weighted slices. Source schemas must align
    * (unionByName). */
  def mixCorpora(
      sources: Seq[(String, DataFrame, Double)],
      keyCol: String,
      salt: String = ""): DataFrame = {
    require(sources.nonEmpty, "mixCorpora: need at least one source")
    sources.map { case (name, df, fraction) =>
      deterministicSample(df, keyCol, fraction, salt + name)
        .withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** RNG-based stratified sample (thin wrapper over sampleBy) for
    * parity with per-stratum sampling APIs; prefer
    * [[deterministicSample]] per stratum when reproducibility across
    * engines/partitionings matters. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      fractions: Map[Any, Double],
      seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Hash-deterministic stratified sample: each stratum is kept at its
    * own fraction via the md5-threshold rule of
    * [[deterministicSample]] (salted per stratum value, so strata draw
    * independently). Strata absent from `fractions` are sampled at
    * `defaultFraction` (0 = dropped). Unlike [[stratifiedSample]] the
    * decision is a pure function of (stratum, key, salt) — stable
    * across runs, engines and partitionings. */
  def deterministicStratifiedSample(
      df: DataFrame,
      stratumCol: String,
      fractions: Map[String, Double],
      keyCol: String,
      salt: String = "",
      defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "deterministicStratifiedSample: fractions must be in [0, 1]")
    val threshold: Column = fractions.foldLeft(
      lit(hexThreshold(defaultFraction))) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === lit(stratum), lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat(lit(salt), col(stratumCol).cast("string"),
        col(keyCol).cast("string"))), 1, 8) < threshold)
  }

  /** Temperature-based corpus rebalancing — the multilingual sampling
    * rule (sample stratum s with probability ∝ n_s^alpha; alpha < 1
    * flattens the head so low-resource strata keep representation,
    * cf. the exponential-smoothing mixing popularised by massively
    * multilingual pretraining). Keeps each stratum at the
    * deterministic hash rate
    *
    *   rate_s = min(1, round(targetRows·n_s^alpha / Σ_t n_t^alpha / n_s, 6))
    *
    * so the expected output is ~`targetRows` rows distributed ∝
    * n_s^alpha (strata capped at rate 1 under-deliver rather than
    * upsample; this single-pass formulation does NOT re-spread the
    * capped mass — the standard practice, documented here as a
    * contract). Rates are derived IN-PLAN: a per-stratum count
    * aggregate (one row per stratum) plus a one-row normaliser are
    * broadcast back onto the corpus, so the 100 TB side sees one
    * narrow pass + a broadcast hash join — no driver collect, no wide
    * shuffle. The rate is rounded to 6 decimals before thresholding
    * so the md5 cut-off is reproducible across engines whose `pow`
    * differs in the last ulp.
    */
  def temperatureMix(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      alpha: Double,
      targetRows: Long,
      salt: String = ""): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureMix: alpha must be in (0, 1], got $alpha")
    require(targetRows > 0, s"temperatureMix: targetRows must be > 0, got $targetRows")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__graft_n"))
    val z = counts.agg(sum(pow(col("__graft_n"), alpha)).as("__graft_z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(stratumCol),
        least(lit(1.0), round(
          lit(targetRows.toDouble) * pow(col("__graft_n"), alpha)
            / col("__graft_z") / col("__graft_n"), 6)).as("__graft_rate"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(col("__graft_rate") >= 1.0 ||
        substring(md5(concat(lit(salt), col(stratumCol).cast("string"),
          col(keyCol).cast("string"))), 1, 8) <
          format_string("%08x", floor(col("__graft_rate") * 4294967296.0).cast("long")))
      .drop("__graft_rate")
  }

  /** Token-budget corpus sharding (sequence-packing's scalable outer
    * loop): within each `partitionCols` group, rows are laid out in
    * `orderCol` order and cut into consecutive shards of ~`budget`
    * total `weightCol` — shard k is the run whose EXCLUSIVE running
    * weight lands in [k·budget, (k+1)·budget). A shard may overflow by
    * at most one row's weight: this is cumulative chunking, not greedy
    * bin-packing — the greedy recurrence ("close the bin when the next
    * row would overflow") is inherently sequential and cannot
    * parallelise, while the cumulative rule is one window aggregate
    * per group. At 100 TB the groups (source, language, date…)
    * parallelise across executors; a single giant group should be
    * pre-split with a hash sub-bucket column appended to
    * `partitionCols` (any deterministic function of the key works —
    * e.g. a hex digit of md5(key) — at the cost of packing shards per
    * sub-bucket). */
  def packShards(
      df: DataFrame,
      weightCol: String,
      budget: Double,
      partitionCols: Seq[String],
      orderCol: String,
      shardCol: String = "shard_id"): DataFrame = {
    require(budget > 0.0, s"packShards: budget must be > 0, got $budget")
    require(partitionCols.nonEmpty, "packShards: need at least one partition column")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(shardCol,
      floor(coalesce(sum(col(weightCol)).over(w), lit(0L)) / budget).cast("long"))
  }

  /** Deterministic dataset split (train/val/test): every row gets a
    * split label from where its salted md5 prefix falls in the
    * cumulative fraction ranges — one narrow pass, no shuffle, and the
    * SAME row lands in the same split on every run, engine, and
    * partitioning (the property that keeps eval sets stable across
    * pipeline reruns). Fractions must sum to 1 (±1e-9); the last split
    * absorbs the rounding tail so the ranges cover every hash. */
  def deterministicSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "deterministicSplit: need at least two splits")
    require(splits.forall(_._2 > 0.0), "deterministicSplit: fractions must be > 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"deterministicSplit: fractions must sum to 1, got ${splits.map(_._2).sum}")
    val hash = substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // CASE hash < t1 -> s1 WHEN hash < t2 -> s2 ... ELSE last
    val labeled = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1)) { case (((name, _), upper), acc) =>
      when(hash < lit(hexThreshold(upper)), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, labeled)
  }

  /** Exact-N-per-stratum deterministic sample: keep the `n` rows of
    * each stratum whose salted md5 ranks lowest — a fixed-size quota
    * (eval-set construction, per-language caps) where the fractional
    * samplers can only hit a quota in expectation. Deterministic in
    * (stratum, key, salt); a stratum with fewer than `n` rows keeps
    * all of them.
    *
    * Scale shape: a bare rank window would sort EVERY row of a
    * stratum through one task — a billion-row language would serialise
    * on a single core. Instead each input partition first prunes to
    * its local n smallest ranks per stratum (bounded heap, the same
    * partial-top-k move as
    * [[graft.similarity.Similarity.bruteForceTopKScalable]]), so the
    * exact rank window only sees ≤ n × partitions × strata rows. The
    * per-partition buffer is O(n × strata seen in that partition) —
    * quotas are small and strata few by the op's nature. */
  def quotaSample(
      df: DataFrame,
      stratumCol: String,
      n: Int,
      keyCol: String,
      salt: String = ""): DataFrame = {
    require(n >= 1, s"quotaSample: n must be >= 1, got $n")
    val rankCol = "__graft_qm"
    val withRank = df.withColumn(rankCol,
      md5(concat(lit(salt), col(stratumCol).cast("string"),
        col(keyCol).cast("string"))))
    val sIdx = withRank.schema.fieldIndex(stratumCol)
    val mIdx = withRank.schema.fieldIndex(rankCol)
    val kIdx = withRank.schema.fieldIndex(keyCol)
    // local prune: per partition, keep the n smallest (md5, key) rows
    // of each stratum — a superset of the global winners (any global
    // top-n row is in its partition's top-n)
    val pruned = withRank.mapPartitions { rows =>
      val ord = Ordering.Tuple2(Ordering.String, Ordering.String)
      // max-heap on (md5, key): peek = worst survivor, evict on better
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[((String, String), Row)]]
      rows.foreach { r =>
        val rank = (r.getString(mIdx), String.valueOf(r.get(kIdx)))
        val heap = heaps.getOrElseUpdate(r.get(sIdx),
          scala.collection.mutable.PriorityQueue.empty(Ordering.by(
            (x: ((String, String), Row)) => x._1)(ord)))
        if (heap.size < n) heap.enqueue((rank, r))
        else if (ord.lt(rank, heap.head._1)) { heap.dequeue(); heap.enqueue((rank, r)) }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }(org.apache.spark.sql.Encoders.row(withRank.schema))
    val rank = row_number().over(
      Window.partitionBy(col(stratumCol)).orderBy(col(rankCol), col(keyCol)))
    pruned.withColumn("__graft_qrank", rank)
      .filter(col("__graft_qrank") <= n)
      .drop("__graft_qrank", rankCol)
  }

  /** Materialise the shards [[packShardsGreedy]]/[[packShards]]
    * assigned: one row per (group, shard) with the member texts
    * concatenated IN `orderCol` ORDER (sort_array over (order, text)
    * structs — collect_list alone has no order contract), plus member
    * count and total weight. The output row is the training sequence
    * a packing pipeline ships; the agg is one shuffle on
    * (group, shard). A shard's packed text lives in one row — budget
    * and group sizing must keep it executor-memory-sane, which the
    * packing budget already enforces. */
  def assembleShards(
      df: DataFrame,
      textCol: String,
      weightCol: String,
      partitionCols: Seq[String],
      orderCol: String,
      shardCol: String = "shard_id",
      sep: String = "\n\n"): DataFrame = {
    require(partitionCols.nonEmpty, "assembleShards: need at least one partition column")
    df.groupBy((partitionCols :+ shardCol).map(col): _*)
      .agg(
        concat_ws(sep,
          transform(
            sort_array(collect_list(struct(col(orderCol).as("o"), col(textCol).as("t")))),
            x => x.getField("t"))).as("packed_text"),
        count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("total_weight"))
  }

  /** EXACT greedy bin-packing variant of [[packShards]]: a shard closes
    * when the NEXT row would push it past `budget`, so no shard ever
    * overflows (a single row heavier than the budget gets a shard to
    * itself). The greedy recurrence is sequential WITHIN a group but
    * embarrassingly parallel ACROSS groups, so this is one shuffle on
    * `partitionCols` + an ordered per-partition streaming pass
    * (secondary-sort pattern: repartition on the group key, sort
    * partitions by (group, order), walk each group run carrying
    * (shard, fill) — O(1) state, no per-group materialisation).
    * Prefer [[packShards]] when approximate shard sizes are fine —
    * it needs no repartition of the full corpus beyond the window's
    * own shuffle and tolerates giant groups via sub-bucketing. */
  def packShardsGreedy(
      df: DataFrame,
      weightCol: String,
      budget: Double,
      partitionCols: Seq[String],
      orderCol: String,
      shardCol: String = "shard_id"): DataFrame = {
    require(budget > 0.0, s"packShardsGreedy: budget must be > 0, got $budget")
    require(partitionCols.nonEmpty, "packShardsGreedy: need at least one partition column")
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        shardCol, org.apache.spark.sql.types.LongType, nullable = false))
    val keyIdx = partitionCols.map(df.schema.fieldIndex)
    val wIdx = df.schema.fieldIndex(weightCol)
    val sorted = df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var shard = 0L
      var fill = 0.0
      rows.map { r =>
        val key = keyIdx.map(r.get)
        // null weight = weightless row: joins the current shard
        val w = Option(r.get(wIdx)).map(_.asInstanceOf[Number].doubleValue()).getOrElse(0.0)
        if (key != curKey) { curKey = key; shard = 0L; fill = w }
        else if (fill + w > budget) { shard += 1; fill = w }
        else fill += w
        Row.fromSeq(r.toSeq :+ shard)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    * Spirakis A-ES): each row draws a key `-ln(u) / w` from a
    * deterministic uniform `u ∈ (0, 1]` — the first 8 md5 hex digits
    * of (salt, key), so the SAME rows win on every run, engine, and
    * partitioning (like [[deterministicSplit]]) — and the `n`
    * smallest keys are the sample. Inclusion probability is
    * proportional to weight at each of the n sequential draws
    * (the A-ES guarantee). Rows with null/non-positive weight are
    * excluded (they'd get an infinite key anyway).
    *
    * Scale shape: a narrow projection then a global top-n — Spark
    * plans `TakeOrderedAndProject`, per-partition bounded top-n
    * before the single-partition merge, so the full corpus is never
    * globally sorted. `n` must be driver-modest (it's a sample). */
  def weightedSample(
      df: DataFrame,
      weightCol: String,
      n: Int,
      keyCol: String,
      salt: String = ""): DataFrame = {
    require(n >= 1, s"weightedSample: n must be >= 1, got $n")
    val w = col(weightCol).cast("double")
    val u = (conv(substring(md5(concat(lit(salt), col(keyCol).cast("string"))),
      1, 8), 16, 10).cast("double") + 1.0) / 4294967296.0
    val esKey = -log(u) / w
    df.filter(w.isNotNull && w > 0.0)
      .withColumn("__graft_es", esKey)
      .orderBy(col("__graft_es").asc, col(keyCol).asc)
      .limit(n)
      .drop("__graft_es")
  }

  /** [[weightedSample]] per stratum: the `n` smallest deterministic
    * A-ES keys of each group win (weight-proportional inclusion
    * within every stratum, same md5-derived reproducibility). The
    * global top-n's `TakeOrderedAndProject` has no per-group
    * equivalent, so the bounded selection is
    * [[Ranking.topKPerGroup]]'s per-partition heap prune — the rank
    * window never sees more than n × partitions × strata rows, and a
    * billion-row stratum never serialises through one task. */
  def weightedSamplePerGroup(
      df: DataFrame,
      stratumCol: String,
      weightCol: String,
      n: Int,
      keyCol: String,
      salt: String = ""): DataFrame = {
    require(n >= 1, s"weightedSamplePerGroup: n must be >= 1, got $n")
    val w = col(weightCol).cast("double")
    val u = (conv(substring(md5(concat(lit(salt), col(keyCol).cast("string"))),
      1, 8), 16, 10).cast("double") + 1.0) / 4294967296.0
    Ranking.topKPerGroup(
      df.filter(w.isNotNull && w > 0.0).withColumn("__graft_es", -log(u) / w),
      Seq(stratumCol), "__graft_es", n,
      tieCol = keyCol, descending = false, rankCol = "__graft_esrank")
      .drop("__graft_es", "__graft_esrank")
  }
}
