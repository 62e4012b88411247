package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ids

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

  // concat() null-propagates, so a null key would make every md5 predicate
  // NULL and silently drop the row from the sample (while a fraction-1.0
  // shortcut kept it). Hash null keys as a "\\u0000null" sentinel so they
  // sample at the same rate as everything else. (A STRING key that
  // literally contains that byte sequence collides with the sentinel —
  // benign: such rows get the same deterministic uniform md5 draw as
  // null-keyed rows; changing the sentinel now would silently re-draw
  // every existing null-keyed sample, so the collision is documented
  // rather than eliminated.)
  /** True when a MapType occurs anywhere in the type tree (Spark's hash
    * functions reject maps — see quotaSample's fingerprint). */
  private[core] def containsMapType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMapType(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMapType(a.elementType)
      case _ => false
    }

  private[core] def keyStr(c: Column): Column =
    coalesce(c.cast("string"), lit("\u0000null"))

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
      substring(md5(concat(lit(salt), keyStr(col(keyCol)))), 1, 8)
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

  /** [[mixCorpora]] with per-source TOKEN budgets instead of
    * fractions — how training mixes are actually specified ("200M
    * tokens of source A, 50M of B"): source s samples at rate
    * min(1, budget_s / tokens_s), yielding ≈ its token budget in
    * expectation. Rates derive IN-PLAN (one whitespace-token-count
    * aggregate per source broadcast back onto it — the temperatureMix
    * pattern: no driver collect, one narrow pass + broadcast join per
    * source), rounded to 6 dp so the md5 threshold is reproducible
    * across engines. Sources with no tokens keep rate 1 (nothing to
    * thin). Same per-source salting and `source` tag as
    * [[mixCorpora]]. */
  def mixCorporaByTokens(
      sources: Seq[(String, DataFrame, Long)],
      keyCol: String,
      textCol: String,
      salt: String = ""): DataFrame = {
    require(sources.nonEmpty, "mixCorporaByTokens: need at least one source")
    require(sources.forall(_._3 >= 0),
      "mixCorporaByTokens: token budgets must be >= 0")
    sources.map { case (name, df, budget) =>
      val nTokens = sum(graft.text.TextFunctions.tokenCount(col(textCol)))
      val rates = df.agg(
        round(least(lit(1.0),
          lit(budget.toDouble) / greatest(nTokens.cast("double"), lit(1.0))), 6)
          .as("__graft_rate"))
      df.crossJoin(broadcast(rates))
        .filter(col("__graft_rate") >= 1.0 ||
          substring(md5(concat(lit(salt + name), keyStr(col(keyCol)))), 1, 8) <
            format_string("%08x",
              floor(col("__graft_rate") * 4294967296.0).cast("long")))
        .drop("__graft_rate")
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
      substring(md5(concat(lit(salt), keyStr(col(stratumCol)),
        keyStr(col(keyCol)))), 1, 8) < threshold)
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
        substring(md5(concat(lit(salt), keyStr(col(stratumCol)),
          keyStr(col(keyCol)))), 1, 8) <
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
    val hash = substring(md5(concat(lit(salt), keyStr(col(keyCol)))), 1, 8)
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
    * (stratum, key, salt) — rows duplicated on (stratum, key) are
    * tie-broken by a full-row hash, so the surviving payload is a pure
    * function of the data, not of partitioning; a stratum with fewer
    * than `n` rows keeps all of them.
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
    val fpCol = "__graft_qfp"
    // The md5 rank ties exactly when (stratum, key) is duplicated; without
    // a payload tie-break WHICH duplicate survives would depend on input
    // partitioning. A full-row hash makes the survivor a pure function of
    // the data in both the local heap and the global rank window (rows
    // identical in every column remain interchangeable by construction).
    // Spark prohibits hash expressions over MapType — map-bearing columns
    // enter the fingerprint through to_json instead of raw.
    val fpInputs = df.schema.fields.map { f =>
      if (containsMapType(f.dataType)) to_json(col(f.name)) else col(f.name)
    }
    val withRank = df
      .withColumn(rankCol,
        md5(concat(lit(salt), keyStr(col(stratumCol)), keyStr(col(keyCol)))))
      .withColumn(fpCol, xxhash64(fpInputs.toIndexedSeq: _*))
    val sIdx = withRank.schema.fieldIndex(stratumCol)
    val mIdx = withRank.schema.fieldIndex(rankCol)
    val fIdx = withRank.schema.fieldIndex(fpCol)
    // local prune: per partition, keep the n smallest (md5, fingerprint)
    // rows of each stratum — a superset of the global winners (any global
    // top-n row is in its partition's top-n)
    val pruned = withRank.mapPartitions { rows =>
      val ord = Ordering.Tuple2(Ordering.String, Ordering.Long)
      // max-heap on (md5, fp): peek = worst survivor, evict on better
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[((String, Long), Row)]]
      rows.foreach { r =>
        val rank = (r.getString(mIdx), r.getLong(fIdx))
        val heap = heaps.getOrElseUpdate(r.get(sIdx),
          scala.collection.mutable.PriorityQueue.empty(Ordering.by(
            (x: ((String, Long), Row)) => x._1)(ord)))
        if (heap.size < n) heap.enqueue((rank, r))
        else if (ord.lt(rank, heap.head._1)) { heap.dequeue(); heap.enqueue((rank, r)) }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }(org.apache.spark.sql.Encoders.row(withRank.schema))
    val rank = row_number().over(
      Window.partitionBy(col(stratumCol)).orderBy(col(rankCol), col(fpCol)))
    pruned.withColumn("__graft_qrank", rank)
      .filter(col("__graft_qrank") <= n)
      .drop("__graft_qrank", rankCol, fpCol)
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

  /** Fixed-length sequence packing manifest — concat-and-chunk, the
    * standard autoregressive-pretraining layout: within each
    * `partitionCols` group, docs are laid out in `orderCol` order as
    * ONE continuous token stream and cut into sequences of exactly
    * `seqLen` tokens (only a group's last sequence may be partial).
    * Unlike [[packShards]]/[[packShardsGreedy]] a doc CROSSES sequence
    * boundaries, so the output is one row per (doc, sequence) overlap
    * — the slice manifest a training loader needs to assemble
    * sequences WITHOUT the pipeline ever materialising token-grain
    * rows:
    *
    *   - `seq_id`    sequence index within the group (0-based)
    *   - `doc_start` first token of the slice, 0-based within the doc
    *   - `seq_start` where the slice lands, 0-based in the sequence
    *   - `n_tokens`  slice length
    *
    * Zero-weight docs vanish (they place no tokens; dropping them
    * before the window leaves every other offset unchanged).
    * Scale shape: one window cumsum per group plus a per-doc explode
    * over its spanned sequences — ceil(w/seqLen)+1 rows at most, 1-2
    * for typical docs, so the manifest is O(corpus rows), never
    * O(corpus tokens). Same group-grain contract as [[packShards]]:
    * the cumulative-sum window serialises each group through ONE task,
    * so PARALLELISM = GROUP (shard) COUNT — fine when shards ≈ output
    * files (the production shape; SCALE.md pack_windows rows measure
    * both regimes); pre-split a giant group with a hash sub-bucket
    * appended to `partitionCols`.
    *
    * If `weightCol` is DERIVED (tokenCount over a rendered/extracted
    * column rather than a plain table column), wrap the input in
    * [[graft.core.DataFrameOps.stageFence]]: the w>0 filter here
    * pushes through the deriving projection and re-evaluates its
    * expression tree per reference (measured 6× on the chat pipeline
    * — SCALE.md r15 chat rows). A plain parquet weight column should
    * NOT be fenced — the pushed filter then prunes at the scan. */
  def packTokenWindows(
      df: DataFrame,
      weightCol: String,
      seqLen: Int,
      partitionCols: Seq[String],
      orderCol: String): DataFrame = {
    require(seqLen >= 1, s"packTokenWindows: seqLen must be >= 1, got $seqLen")
    require(partitionCols.nonEmpty,
      "packTokenWindows: need at least one partition column")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val L = lit(seqLen.toLong)
    df.filter(col(weightCol) > 0)
      .withColumn("__graft_off",
        coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L)))
      .withColumn("__graft_w", col(weightCol).cast("long"))
      .withColumn("seq_id", explode(sequence(
        floor(col("__graft_off") / L).cast("long"),
        floor((col("__graft_off") + col("__graft_w") - 1) / L).cast("long"))))
      .withColumn("doc_start",
        greatest(col("seq_id") * L - col("__graft_off"), lit(0L)))
      .withColumn("seq_start",
        greatest(col("__graft_off") - col("seq_id") * L, lit(0L)))
      .withColumn("n_tokens",
        least(col("__graft_off") + col("__graft_w"), (col("seq_id") + 1) * L)
          - greatest(col("__graft_off"), col("seq_id") * L))
      .drop("__graft_off", "__graft_w")
  }

  /** Per-group packing economics for a [[packTokenWindows]] layout —
    * the numbers a data-engineering review asks for before a training
    * run: total tokens, sequence count, boundary-crossing doc count,
    * and the padding waste of the final partial sequence. One pass
    * over the manifest (group-key grain aggregate). */
  def tokenPackingStats(
      manifest: DataFrame,
      idCol: String,
      seqLen: Int,
      partitionCols: Seq[String]): DataFrame = {
    require(seqLen >= 1, s"tokenPackingStats: seqLen must be >= 1, got $seqLen")
    require(partitionCols.nonEmpty,
      "tokenPackingStats: need at least one partition column")
    val perDoc = manifest
      .groupBy((partitionCols :+ idCol).map(col): _*)
      .agg(sum(col("n_tokens")).as("__graft_doc_tok"),
        count(lit(1)).as("__graft_doc_slices"))
    perDoc.groupBy(partitionCols.map(col): _*)
      .agg(
        sum(col("__graft_doc_tok")).as("total_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("__graft_doc_slices") > 1, 1L).otherwise(0L))
          .as("n_split_docs"))
      .withColumn("n_sequences",
        ceil(col("total_tokens").cast("double") / seqLen).cast("long"))
      .withColumn("tail_pad_tokens",
        (col("n_sequences") * seqLen) - col("total_tokens"))
  }

  /** [[packTokenWindows]] materialised: one row per (group, sequence)
    * with the packed whitespace-token slice assembled in order — the
    * literal training sequence. Tokenisation (trimmed whitespace
    * split) happens HERE so slice indices always align with the
    * manifest's weights; callers pick only the sequence length. The
    * agg is one shuffle at (group, seq_id) grain and a sequence's text
    * lives in one row — seqLen must stay executor-memory-sane, which
    * a training context length is by construction. */
  def assembleTokenWindows(
      df: DataFrame,
      textCol: String,
      seqLen: Int,
      partitionCols: Seq[String],
      orderCol: String,
      sep: String = " "): DataFrame = {
    require(seqLen >= 1, s"assembleTokenWindows: seqLen must be >= 1, got $seqLen")
    require(partitionCols.nonEmpty,
      "assembleTokenWindows: need at least one partition column")
    val toks = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val withToks = df.withColumn("__graft_toks", toks)
      .withColumn("__graft_ntok", size(col("__graft_toks")).cast("long"))
    val manifest = packTokenWindows(
      withToks, "__graft_ntok", seqLen, partitionCols, orderCol)
    manifest
      .withColumn("__graft_slice", slice(col("__graft_toks"),
        (col("doc_start") + 1).cast("int"), col("n_tokens").cast("int")))
      .groupBy((partitionCols :+ "seq_id").map(col): _*)
      .agg(
        concat_ws(sep,
          flatten(transform(
            sort_array(collect_list(struct(
              col("seq_start").as("o"), col("__graft_slice").as("t")))),
            x => x.getField("t")))).as("seq_text"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
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
    val u = (conv(substring(md5(concat(lit(salt), keyStr(col(keyCol)))),
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
    val u = (conv(substring(md5(concat(lit(salt), keyStr(col(keyCol)))),
      1, 8), 16, 10).cast("double") + 1.0) / 4294967296.0
    Ranking.topKPerGroup(
      df.filter(w.isNotNull && w > 0.0).withColumn("__graft_es", -log(u) / w),
      Seq(stratumCol), "__graft_es", n,
      tieCol = keyCol, descending = false, rankCol = "__graft_esrank")
      .drop("__graft_es", "__graft_esrank")
  }

  /** Deterministic global training-order shuffle: adds `outputCol`
    * with each row's position 0..n−1 in the pseudo-random permutation
    * defined by `md5(salt || key)` — a pure function of (key set,
    * salt), independent of input partitioning, so a re-run (or a
    * different engine) reproduces the exact epoch order; distinct
    * salts are independent permutations (epoch 2 = new salt). This is
    * the "global shuffle before training" step every data loader
    * wants but cannot get reproducibly from `ORDER BY rand()`.
    *
    * Scale shape: a bare `row_number() OVER (ORDER BY hash)` plans as
    * a SINGLE-partition sort — the canonical scale-killer. Positions
    * come from [[graft.operators.Ids.assignContiguousIds]] instead
    * (range exchange on the hash + parallel local sorts + broadcast
    * partition offsets), so the one corpus-wide movement is the range
    * exchange that any global shuffle needs anyway. `keyCol` must be
    * unique (the same contract as the Ids total order); duplicate
    * keys would tie across a range boundary non-deterministically. */
  def shuffleDeterministic(
      df: DataFrame,
      keyCol: String,
      salt: String = "",
      outputCol: String = "position",
      numPartitions: Option[Int] = None): DataFrame = {
    val hashCol = "__graft_shuf"
    Ids.assignContiguousIds(
      df.withColumn(hashCol, md5(concat(lit(salt), keyStr(col(keyCol))))),
      Seq(hashCol, keyCol), outputCol, numPartitions)
      .drop(hashCol)
  }
}
