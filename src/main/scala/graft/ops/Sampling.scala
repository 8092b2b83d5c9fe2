package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data curation.
  *
  * Both operators key on a stable content hash, never on rand():
  * assignments are reproducible run-to-run, survive retries and
  * repartitioning, and new data joins a split WITHOUT reshuffling old
  * rows' assignments — the property that matters when a 100 TB corpus is
  * curated incrementally. md5-derived buckets in [0, 10000) give
  * basis-point-precision fractions, replayable in any engine.
  */
object Sampling {

  /** Basis-point bucket of a key column: md5 → 60-bit int → mod 10000.
    * Uniform over keys, identical in Spark and the DuckDB oracle.
    *
    * Null keys bucket as the empty string — a DETERMINISTIC bucket, so
    * hashSplit, hashSample and capPerKey all treat nullable keys the same
    * way (previously a null fell through hashSplit's when() chain into
    * 'test' but was silently DROPPED by hashSample's filter). All nulls
    * share one bucket; a corpus where null keys are common should derive a
    * real key (e.g. [[graft.norm.Norm.docId]]) first. */
  def hashBucketBp(key: Column): Column =
    pmod(graft.util.Hash.md5Bits60(coalesce(key.cast("string"), lit(""))), lit(10000L))

  /** Deterministic train/val/test split: rows land in 'train' below
    * `trainBp`, 'val' below `trainBp + valBp`, else 'test'. */
  def hashSplit(df: DataFrame, keyCol: String,
                trainBp: Int = 9000, valBp: Int = 500): DataFrame = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= 10000,
      s"split fractions must fit in 10000 bp, got train=$trainBp val=$valBp")
    require(!df.columns.contains("split") && !df.columns.contains("_bp"),
      "input must not already contain 'split' or '_bp' columns (would be clobbered)")
    df.withColumn("_bp", hashBucketBp(col(keyCol)))
      .withColumn("split",
        when(col("_bp") < trainBp, lit("train"))
          .when(col("_bp") < trainBp + valBp, lit("val"))
          .otherwise(lit("test")))
      .drop("_bp")
  }

  /** Deterministic sub-sample: keep rows whose key bucket < `keepBp`.
    * A 10× larger corpus keeps the SAME rows plus new ones (hash
    * stability), unlike rand()-sampling which re-draws everything. */
  def hashSample(df: DataFrame, keyCol: String, keepBp: Int): DataFrame = {
    require(keepBp >= 0 && keepBp <= 10000, s"keepBp out of range: $keepBp")
    df.filter(hashBucketBp(col(keyCol)) < keepBp)
  }

  /** Stratified (per-stratum) deterministic sample — the data-MIXING
    * primitive: each stratum keeps its own fraction (basis points), so a
    * training mix like "100% wiki, 25% web, 10% default" is one filter.
    * Strata not named in `bpByStratum` fall back to `defaultBp`.
    *
    * The keep decision hashes the ROW id, not the stratum, so within every
    * stratum the kept subset is uniform, stable under reruns/growth, and
    * NESTED across fraction changes (raising a stratum's bp keeps all
    * previously kept rows — reproducible mixture ablations). Evaluated as
    * a literal CASE chain: no join, no broadcast, pure codegen filter. */
  def hashSampleStratified(df: DataFrame, stratumCol: String, idCol: String,
                           bpByStratum: Map[String, Int], defaultBp: Int): DataFrame = {
    (bpByStratum.values.toSeq :+ defaultBp).foreach(bp =>
      require(bp >= 0 && bp <= 10000, s"keepBp out of range: $bp"))
    val keepBp = bpByStratum.toSeq.sortBy(_._1).foldRight(lit(defaultBp): Column) {
      case ((s, bp), acc) => when(col(stratumCol) === s, lit(bp)).otherwise(acc)
    }
    df.filter(hashBucketBp(col(idCol)) < keepBp)
  }

  /** Temperature-flattened mixture sampling (τ = 0.5): per-stratum keep
    * fractions proportional to sqrt(stratum size), scaled so the expected
    * total kept is `totalKeepBp` of the corpus — the standard
    * up-weight-the-tail mixing rule for multi-source training corpora
    * (multilingual T5's α-smoothed sampling with α = 1/2; Raffel et al.
    * 2020 §3.4.3). τ is FIXED at 1/2 because sqrt is IEEE-754-exact —
    * an arbitrary-τ pow() would differ in the last ulp across engines and
    * break replayability.
    *
    * All arithmetic is exact: weights quantize to floor(sqrt(n)·2^20)
    * BIGINTs before summing (merge-order-free), and each stratum's
    * bp = min(10000, (totalKeepBp·N·w_s) div (Σw·n_s)) is integer
    * division. The row-level keep decision hashes `idCol` (uniform and
    * NESTED within each stratum, like [[hashSampleStratified]]).
    * Overflow bound: the products run in DECIMAL(38,0) (totalKeepBp·N·w
    * would overflow a BIGINT already near 10^6-10^7 rows at 2^20 weight
    * quantization), so the formula is exact to ~10^18 rows per call
    * (10^4 · N · sqrt(N)·2^20 < 10^38) — see [[keepBpExpr]]. */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
                     totalKeepBp: Int): DataFrame = {
    require(totalKeepBp >= 0 && totalKeepBp <= 10000, s"totalKeepBp out of range: $totalKeepBp")
    require(Seq("_n", "_wq", "_keep_bp", "_stratum").forall(!df.columns.contains(_)),
      "input collides with temperatureMix internal columns")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_wq", expr("cast(floor(sqrt(cast(_n as double)) * 1048576.0D) as bigint)"))
    val tot = counts.groupBy()
      .agg(sum(col("_n")).as("_totn"), sum(col("_wq")).as("_sumw"))
    val bps = counts.crossJoin(broadcast(tot))
      .withColumn("_keep_bp", keepBpExpr(totalKeepBp))
      .select(col(stratumCol).as("_stratum"), col("_keep_bp"))
    // null-safe join key: a null stratum is ITS OWN stratum (matching the
    // groupBy above), not silently dropped by equi-join semantics
    df.join(broadcast(bps), col(stratumCol) <=> col("_stratum"))
      .filter(hashBucketBp(col(idCol)) < col("_keep_bp"))
      .drop("_stratum", "_keep_bp")
  }

  /** The stratum keep-fraction formula over (_totn, _wq, _sumw, _n):
    * min(10000, (totalKeepBp·_totn·_wq) div (_sumw·_n)) with DECIMAL(38,0)
    * intermediates — a pure-BIGINT product overflows around 10^6-10^7 rows
    * (wq ~ sqrt(n)·2^20), which under ANSI mode throws and otherwise wraps
    * into wrong/negative fractions. `div` on decimals yields BIGINT, so the
    * column type (and thus the oracle hash) is unchanged; the DuckDB replay
    * widens identically via HUGEINT. Package-private for the overflow
    * property test. */
  private[graft] def keepBpExpr(totalKeepBp: Int): Column =
    least(lit(10000L),
      expr(s"(cast($totalKeepBp as decimal(38,0)) * _totn * _wq) div (cast(_sumw as decimal(38,0)) * _n)"))

  /** Data-mixing quota: keep at most `maxPerKey` rows per `keyCol` group,
    * chosen deterministically by hash order of `idCol` (then id as the
    * total tie-break) — NOT by input order, so the surviving set is
    * reproducible across reruns and partitionings. One window shuffle on
    * the group key. A window partition lands entirely on one task (AQE
    * cannot split it like a join); if one key dominates at scale,
    * pre-filter with `hashSample` to near the quota before ranking. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, maxPerKey: Int): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    require(!df.columns.contains("_qrn"), "input must not already contain a '_qrn' column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucketBp(col(idCol)), col(idCol))
    df.withColumn("_qrn", row_number().over(w))
      .filter(col("_qrn") <= maxPerKey)
      .drop("_qrn")
  }

  /** Token-budget mix assembly: per key, admit rows best-score-first (ties:
    * min id) until the cumulative token count would pass `budget` — the "N
    * tokens per source" step of a training-mix builder, where quotas are
    * counted in tokens, not documents ([[capPerKey]]'s unit). A row is kept
    * iff its INCLUSIVE running total stays within budget, so the output
    * never exceeds the budget and admission is a deterministic prefix of
    * the score order (stable across reruns and partitionings). One window
    * shuffle on the key; emits the running total as `cum_tokens`. The
    * [[capPerKey]] skew caveat applies — a window partition lands on one
    * task, so pre-thin a dominating key before ranking. */
  def tokenBudgetPerKey(df: DataFrame, keyCol: String, idCol: String,
                        tokenCol: String, scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(!df.columns.contains("cum_tokens"), "input must not already contain a 'cum_tokens' column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Fractional epoch repetition for data mixing (the "2.3 epochs of
    * source X" knob of a pretraining mix): `factorBpCol` holds the repeat
    * factor in basis points (10000 = exactly one epoch), every row gets
    * `factorBp div 10000` full copies plus one more iff its seeded hash
    * bucket lands under the fractional remainder — so the realized epoch
    * count converges to the factor per key while each document's copy
    * count is a pure function of (id, seed), reproducible across reruns
    * and partitionings. Map-only (hash + explode); rows with 0 copies
    * vanish. Emits `copy_idx` in [0, n_copies). */
  def epochRepeat(df: DataFrame, idCol: String, factorBpCol: String, seed: Int): DataFrame = {
    require(!df.columns.contains("_n_copies"), "input must not already contain '_n_copies'")
    // Negative factors are meaningless here AND engine-divergent (Spark's
    // div/% truncate toward zero, DuckDB's floor), so fail the job rather
    // than silently diverge: assert non-negativity row-by-row inside the
    // plan (raise_error keeps this map-only — no extra pass).
    val factor = col(factorBpCol)
    val checked = when(factor >= 0, factor).otherwise(raise_error(concat(
      lit(s"epochRepeat: $factorBpCol must be non-negative, got "), factor.cast("string"))))
    val keep = (graft.util.Hash.seededBucket(col(idCol).cast("string"), seed, 10000L)
      < col("_fbp_ok") % 10000).cast("long")
    df.withColumn("_fbp_ok", checked)
      .withColumn("_n_copies", expr("_fbp_ok div 10000") + keep)
      .filter(col("_n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_n_copies") - 1)))
      .drop("_n_copies", "_fbp_ok")
  }

  /** Deterministic epoch shuffle + sharding for training order: every row
    * gets a seeded 60-bit permutation key, a shard (`key mod nShards`),
    * and its 1-based position within the shard in key order — the
    * reproducible "global shuffle" a trainer needs so that epoch N's data
    * order is a pure function of (corpus, seed), not of cluster
    * scheduling. Different seeds give independent epoch permutations.
    *
    * Scale shape: one window shuffle partitioned BY SHARD — position is
    * never a global row_number, so there is no single-partition sort.
    * Size `nShards` to the trainer's reader parallelism (hundreds to
    * thousands at 100 TB); each shard's window then holds ~corpus/nShards
    * rows. The writer pairs this with `.repartition(nShards, shard)` +
    * `sortWithinPartitions(pos)` for a one-file-per-shard layout. */
  def shardOrder(df: DataFrame, idCol: String, seed: Int, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // the raw 60-bit seeded word (no mod): the permutation key itself
    val key = graft.util.Hash.md5Bits60(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_pk"), col(idCol))
    df.withColumn("_pk", key)
      .withColumn("shard", pmod(col("_pk"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_pk")
  }

  /** UniMax budget waterfill (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling"): visit keys ASCENDING by size; each
    * takes `min(n_i · maxEpochs, remaining / keysLeft)` of the budget —
    * small languages are oversampled up to the epoch cap, large ones
    * absorb the evenly-split remainder. All integer (docs and basis
    * points, floor division), so the schedule replays bit-exactly. Ties
    * in size break on the key (ascending) — the visit order must be a
    * pure function of the counts. Returns `(key, n, alloc, factorBp)` in
    * visit order; `factorBp = alloc·10000 div n` feeds [[epochRepeat]].
    *
    * Driver-side on purpose: the input is one row per language/source —
    * the same bounded-model-artifact contract as the IVF codebook. */
  def unimaxAllocations(counts: Seq[(String, Long)], budget: Long,
                        maxEpochsBp: Long): Seq[(String, Long, Long, Long)] = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(maxEpochsBp >= 0, s"maxEpochsBp must be non-negative, got $maxEpochsBp")
    val asc = counts.sortBy { case (k, n) => (n, k) }
    var remaining = budget
    asc.zipWithIndex.map { case ((k, n), i) =>
      val keysLeft = asc.length - i
      val alloc = math.min(n * maxEpochsBp / 10000L, remaining / keysLeft)
      remaining -= alloc
      val factorBp = if (n == 0) 0L else alloc * 10000L / n
      (k, n, alloc, factorBp)
    }
  }

  /** The materialized UniMax mix: per-key counts (one bounded collect) →
    * waterfill → broadcast allocation join → [[epochRepeat]] with each
    * key's derived factor. Output keeps the waterfill integers
    * (`n_key`, `alloc`, `factor_bp`) on every row so the schedule itself
    * sits under the hash gate, plus the per-doc `copy_idx` stream a
    * trainer consumes. */
  def mixUnimax(df: DataFrame, idCol: String, keyCol: String,
                budget: Long, maxEpochsBp: Long, seed: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the key is a language/domain tag — normalize to string (a typed
    // key would ClassCastException in the collect) and reject nulls
    // explicitly (a null key has no waterfill semantics and would NPE
    // inside unimaxAllocations' ordering)
    val keyed = df.select(col(idCol), col(keyCol).cast("string").as(keyCol))
    val counts = keyed.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"mixUnimax: null values in key column '$keyCol' — " +
            "filter or impute them before mixing")
        r.getString(0) -> r.getLong(1)
      }.toSeq
    val allocDf = unimaxAllocations(counts, budget, maxEpochsBp)
      .toDF(keyCol, "n_key", "alloc", "factor_bp")
    val joined = keyed.join(broadcast(allocDf), keyCol)
    epochRepeat(joined, idCol, "factor_bp", seed)
      .select(col(keyCol), col("n_key"), col("alloc"), col("factor_bp"),
        col(idCol), col("copy_idx"))
  }

  /** Curriculum ordering (Bengio et al. 2009, applied to LLM data as
    * easy-first phase scheduling): rows are banded into difficulty
    * PHASES by fixed score thresholds, then given a deterministic
    * shuffled position within (phase, shard) — the trainer consumes
    * phases in order and shards in parallel, so the whole schedule is a
    * pure function of (corpus, cuts, seed).
    *
    * Value-banded phases (score >= cuts(0) → phase 1, >= cuts(1) →
    * phase 2, …, else phase cuts.length+1) rather than quantiles, ON
    * PURPOSE: quantile phases (ntile) need a global total order — a
    * single-partition sort at corpus scale — while a value band is
    * map-only and stable under corpus growth (a document's phase never
    * changes because other documents arrived). Positioning reuses
    * [[shardOrder]]'s per-shard window idiom: no global row_number
    * anywhere. */
  def curriculum(df: DataFrame, idCol: String, scoreCol: String,
                 cuts: Seq[Long], seed: Int, nShards: Int): DataFrame = {
    require(cuts.nonEmpty, "need at least one phase cut")
    require(cuts.sliding(2).forall(p => p.length < 2 || p(1) < p(0)),
      s"phase cuts must be strictly descending, got ${cuts.mkString(",")}")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val phase = cuts.zipWithIndex.foldRight(lit(cuts.length + 1L)) {
      case ((cut, i), rest) => when(col(scoreCol) >= cut, lit(i + 1L)).otherwise(rest)
    }
    val key = graft.util.Hash.md5Bits60(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("phase"), col("shard")).orderBy(col("_pk"), col(idCol))
    df.withColumn("phase", phase)
      .withColumn("_pk", key)
      .withColumn("shard", pmod(col("_pk"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_pk")
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1996: shard(id) = argmax over shards of h(shard, id).
    * The property a 100 TB layout cares about: growing n → n+1 shards
    * moves EXACTLY the rows whose new shard wins the argmax — an expected
    * 1/(n+1) of the corpus — where `pmod(h, n)` reshuffles ~100% of rows.
    * Re-sharding cost is therefore proportional to the CHANGE, not the
    * corpus (the same contract [[hashSplit]] gives splits and
    * [[graft.ops.Dedup]]'s incremental index gives dedup state).
    *
    * Cost contract: O(nShards) md5s per row, map-only — right for
    * tens-to-hundreds of shards (the trainer-reader regime); a
    * thousands-of-shards layout should pay the two-level form (rendezvous
    * over shard GROUPS, then within the winner) rather than a wider
    * argmax. Ties (two shards hashing equal for one id) break to the
    * higher shard index — a fixed total order, so the assignment is a
    * pure function of (id, nShards) in any engine. */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 1024,
      s"nShards must be in [1, 1024] (O(n) hashes per row), got $nShards")
    val idStr = id.cast("string")
    val arr = transform(sequence(lit(0), lit(nShards - 1)), s =>
      struct(
        graft.util.Hash.md5Bits60(concat(s.cast("string"), lit(":"), idStr)).as("h"),
        s.cast("long").as("sh")))
    array_max(arr).getField("sh")
  }

  /** Seeded fixed-k UNIFORM sample without replacement — the unweighted
    * sibling of [[prioritySample]] ("distributed reservoir"): every row
    * is ranked by the seeded 60-bit md5 word of its id and the k
    * smallest win. Under the random-oracle hash every k-subset is
    * equally likely (classical bottom-k sampling), but unlike
    * single-pass reservoir state the membership rule is ORDER-FREE and
    * MERGEABLE: the same (seed, id) always gets the same priority, so
    * retries, shard unions, and incremental corpus growth agree on the
    * sample with no coordination — growth can only evict the current
    * maximum, exactly the KMV sketch's property ([[Kmv]]), here used for
    * row selection instead of cardinality. The production use: a fixed
    * eval/holdout slice of a growing corpus that stays stable under
    * re-ingestion.
    *
    * Scale shape: map-only hash + TakeOrdered(k) (per-partition bottom-k
    * heaps merged on the driver) — no shuffle, no global sort; the rank
    * window runs on k rows. Returns (rank, <idCol>, h60). */
  def uniformSample(df: DataFrame, idCol: String, k: Int, seed: Int = 7): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val bottom = df
      .select(col(idCol), graft.util.Hash.md5Bits60(
        concat(lit(s"$seed:"), col(idCol).cast("string"))).as("h60"))
      .orderBy(col("h60"), col(idCol)).limit(k)
    val w = Window.orderBy(col("h60"), col(idCol))
    bottom.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(idCol), col("h60"))
  }

  /** Priority sampling (Duffield, Lund, Thorup 2007, "Priority sampling
    * for estimation of arbitrary subset sums"): a weight-aware fixed-size
    * sample with unbiased subset-sum estimates. Each row gets priority
    * q_i = w_i / u_i with u_i a per-row uniform; the k highest-priority
    * rows are the sample and every sampled row's estimated weight is
    * max(w_i, tau) with tau the (k+1)-th priority — sum of est_w over any
    * sampled subset is an unbiased estimate of that subset's true total
    * weight. The production use: subsample a token-weighted corpus to a
    * fixed row budget while keeping per-source/per-domain token totals
    * estimable from the sample alone.
    *
    * Determinism contract (what makes the sample oracle-replayable):
    * u_i is the TOP 40 BITS of the seeded md5 word, as the integer
    * h40 + 1 on [1, 2^40] — priority is the exact integer
    * q_i = (w_i << 40) div (h40 + 1), which fits a BIGINT for
    * w_i <= 2^20 (enforced in-plan) and replays exactly in any engine;
    * 40-bit u resolution only coarsens tie granularity, and ties break
    * on the id. The estimator is insensitive to u granularity at these
    * magnitudes (documented divergence from real-valued u: none at the
    * integer comparison surface, up to 2^-40 quantization of tau).
    *
    * Scale shape: the priority is map-only; the k+1 selection is a
    * TakeOrdered (per-partition top-(k+1) heaps merged on the driver —
    * no global sort, no shuffle of the corpus); the rank window then
    * runs on k+1 ROWS, not the corpus. Returns the k sampled rows:
    * (rank, <idCol>, w, est_w). */
  def prioritySample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int, seed: Int = 7): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // h40 via IntegralDivide (`div`), NOT Column.divide: long/long divide
    // promotes to double, and md5Bits60 values above 2^53 round (ulp up
    // to 128 near 2^60) before the divide — hashes just below a 2^20
    // multiple would floor to a different h40 than the oracle's exact
    // integer `h // 2^20`, silently breaking the replays-exactly contract
    val bound = df
      .withColumn("_h60", graft.util.Hash.md5Bits60(
        concat(lit(s"$seed:"), col(idCol).cast("string"))))
      .withColumn("_h40", expr(s"_h60 div ${1L << 20}L"))
      .withColumn("w", weightCol.cast("long"))
      .withColumn("w", when(col("w") <= 0L || col("w") > (1L << 20),
        expr("raise_error(concat('prioritySample weight out of (0, 2^20]: ', CAST(w AS STRING)))"))
        .otherwise(col("w")))
      .withColumn("_q", expr(s"(w * ${1L << 40}L) div (_h40 + 1)"))
    val top = bound.select(col(idCol), col("w"), col("_q"))
      .orderBy(desc("_q"), col(idCol)).limit(k + 1)
    // k+1 rows: the window below sorts a BOUNDED relation, never the corpus
    val w = Window.orderBy(desc("_q"), col(idCol))
    val ranked = top.withColumn("rank", row_number().over(w).cast("long"))
    // tau as a 1-row aggregate (null when the corpus has <= k rows —
    // then every row is sampled and est_w = w, the DLT convention)
    val tau = ranked.agg(max(when(col("rank") === (k + 1).toLong, col("_q"))).as("_tau"))
    ranked.filter(col("rank") <= k.toLong)
      .crossJoin(broadcast(tau))
      .select(col("rank"), col(idCol), col("w"),
        greatest(col("w"), coalesce(col("_tau"), lit(0L))).as("est_w"))
  }
}
