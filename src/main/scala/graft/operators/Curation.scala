package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Dataset-curation operators for training pipelines: deterministic
  * train/eval splits and token-budget sequence packing.
  *
  * Both are pure column arithmetic or per-partition windows — nothing here
  * depends on RNG state, cluster size, or task scheduling, so the same
  * corpus always curates identically (the property a 100 TB pipeline needs
  * to make splits reproducible across re-runs and engine versions).
  */
object Curation {

  /** Deterministic, portable train/eval split: bucket = (first 8 md5 hex
    * digits of the id's string form) mod 100, `split` = "train" iff
    * bucket < trainPct. Row-local codegen'd arithmetic — no shuffle, no
    * sampling — and stable under corpus growth: adding documents never
    * moves an existing document across the split, which per-fraction
    * random sampling cannot promise. md5-hex is bit-identical across
    * engines (the oracle recomputes it in SQL), unlike engine-private
    * hashes (xxhash64/murmur).
    */
  /** The house md5-derived uniform: first 8 hex chars of md5(id) as a long
    * in [0, 2^32). ONE definition on purpose — [[hashSplit]],
    * [[sampleStratified]] and [[sampleWeighted]] must stay bit-identical
    * for the documented nesting guarantees (a row kept at fraction f is
    * kept at every f' > f, across ALL of them) and for their DuckDB oracle
    * twins (`CAST('0x'||substr(md5(id),1,8) AS BIGINT)`).
    */
  private def md5Priority(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast(LongType)

  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 90): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"hashSplit: trainPct must be in (0,100), got $trainPct")
    df.withColumn("split_bucket", (md5Priority(idCol) % 100).cast("int"))
      .withColumn("split",
        when(col("split_bucket") < trainPct, lit("train")).otherwise(lit("eval")))
  }

  /** Split-leakage report: near-duplicate clusters straddling a split
    * boundary — THE eval-contamination bug id-keyed splitting produces
    * (two near-identical documents hash to different buckets, the model
    * trains on one and is scored on the other). `pairs` is any duplicate
    * pair frame (`id_a`, `id_b` — LSH-verified at scale, [[Dedup
    * .ngramJaccardPairs]] in the oracle-bounded form), `split` carries
    * (`idCol`, `splitCol`). One row per offending cluster with its size
    * and the sorted distinct splits it touches; empty means the split is
    * leakage-free. Scale: component labels are bounded by the
    * near-duplicate count (never the corpus), the join is id-keyed, and
    * the agg is one keyed hash aggregate — same budget as the dedup
    * pipeline that produced `pairs`.
    */
  def splitLeakage(pairs: DataFrame, split: DataFrame, idCol: String,
                   splitCol: String): DataFrame =
    splitLeakageFromLabels(Dedup.duplicateGroups(pairs), split, idCol, splitCol)

  /** [[splitLeakage]] over PRECOMPUTED component labels (`id`, `group_id`
    * — [[Dedup.duplicateGroups]] output). The report and the
    * [[hashSplitByClusterFromLabels]] fix consume the same labels; sharing
    * them runs the candidate pipeline and the components ONCE instead of
    * once per consumer (at 100 TB the candidate generation is the dominant
    * cost — recomputing it per audit would double the pipeline).
    */
  def splitLeakageFromLabels(labels: DataFrame, split: DataFrame,
                             idCol: String, splitCol: String): DataFrame =
    labels
      .join(split.select(col(idCol).as("id"), col(splitCol).as("__split")),
        Seq("id"))
      .groupBy("group_id")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__split")).as("n_splits"),
        array_join(sort_array(collect_set(col("__split"))), ",").as("splits"))
      .filter(col("n_splits") > 1)

  /** [[hashSplit]] at CLUSTER granularity — the fix for what
    * [[splitLeakage]] reports: the split key is the duplicate cluster's
    * min-id label (`coalesce(group_id, id)`), so every member of a
    * near-duplicate cluster lands in the same split by construction.
    * A strict refinement of [[hashSplit]]: documents in no cluster keep
    * their exact id-keyed assignment (same md5 arithmetic on the same
    * key), so only the leaking minority moves. Output adds `split_key`
    * (the audit trail: which label decided the bucket) alongside
    * hashSplit's `split_bucket`/`split`. One bounded label join + the
    * same row-local bucket arithmetic — no new shuffle shape.
    */
  def hashSplitByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
                         trainPct: Int = 90): DataFrame =
    hashSplitByClusterFromLabels(df, idCol, Dedup.duplicateGroups(pairs),
      trainPct)

  /** [[hashSplitByCluster]] over precomputed component labels — see
    * [[splitLeakageFromLabels]] for why sharing labels matters.
    */
  def hashSplitByClusterFromLabels(df: DataFrame, idCol: String,
                                   clusterLabels: DataFrame,
                                   trainPct: Int = 90): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"hashSplitByCluster: trainPct must be in (0,100), got $trainPct")
    val labels = clusterLabels
      .select(col("id").as(idCol), col("group_id"))
    df.join(labels, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("group_id"), col(idCol)))
      .drop("group_id")
      .withColumn("split_bucket", (md5Priority("split_key") % 100).cast("int"))
      .withColumn("split",
        when(col("split_bucket") < trainPct, lit("train")).otherwise(lit("eval")))
  }

  /** Token-budget sequence packing: documents in `idCol` order are laid
    * end-to-end and cut into `budgetTokens`-sized context windows; each doc
    * is assigned the pack where its FIRST token falls (`pack_id`), plus its
    * offset within that pack — the deterministic contiguous form of
    * training-batch packing (a doc longer than the budget simply spans
    * packs, starting at its assigned one).
    *
    * The global running token count is the scale hazard — a naive
    * `Window.orderBy(id)` funnels the corpus through ONE partition. This
    * runs the [[graft.functions.RowHash.orderedDenseId]] two-pass shape
    * instead: range-repartition by id (frozen by an eager local checkpoint
    * — RangePartitioner re-samples per action, see that method's note),
    * per-partition token sums to the driver (one row per partition:
    * metadata-scale), cumulative offsets back as a broadcast map literal,
    * and the intra-partition prefix sum as a PER-PARTITION window — every
    * stage distributed and codegen'd.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Long): DataFrame =
    packSequencesByCount(df, idCol,
      TextAnalysis.tokenCountWs(col(textCol)), budgetTokens)

  /** [[packSequences]] with the per-document token count as an arbitrary
    * expression over the row — the trainer-facing form (VERDICT r9
    * §missing-1): a packing budget is denominated in TOKENIZER tokens, so
    * the count column is [[Bpe.bpeTokenCount]] under the trained vocab,
    * not the whitespace proxy. Same two-pass distributed prefix-sum
    * machinery; the count expression is evaluated map-side once.
    */
  def packSequencesByCount(df: DataFrame, idCol: String, tokenCount: Column,
                           budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"packSequences: budget must be > 0, got $budgetTokens")
    val base = df
      .select(col(idCol),
        coalesce(tokenCount.cast(LongType), lit(0L))
          .as("n_tok"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .localCheckpoint(true) // freeze row->partition across the two actions
    val tagged = base.withColumn("__pid", spark_partition_id())
    val sums = tagged.groupBy("__pid").agg(sum("n_tok").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) => val o = acc; acc += s; pid -> o }
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map_from_arrays(array(offsets.map(p => lit(p._1)).toIndexedSeq: _*),
          array(offsets.map(p => lit(p._2)).toIndexedSeq: _*)),
        col("__pid"))
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("__cum0", coalesce(sum(col("n_tok")).over(w), lit(0L)) + offCol)
      .withColumn("pack_id", expr(s"__cum0 div ${budgetTokens}L"))
      .withColumn("pack_offset", col("__cum0") % budgetTokens)
      .drop("__pid", "__cum0")
  }

  /** Materialized trainer packs WITH document-boundary metadata (r14,
    * VERDICT r13 §next-3): where [[packSequencesByCount]] returns the
    * pack ARITHMETIC (pack_id, pack_offset per document), this returns
    * the pack ROWS a trainer loads — `(pack_id, input_ids, doc_spans)`:
    *
    *   - the framed member sequences (`idsCol`, each already
    *     [[SpecialTokens.addSpecials]]-framed) are laid end-to-end in
    *     `idCol` order and CUT at `budgetTokens` boundaries — the
    *     contiguous-stream form of the pack arithmetic, so a document
    *     crossing a boundary contributes one piece to each pack it
    *     overlaps and `doc_spans` concatenated across packs rebuilds
    *     its framed sequence exactly (gate-pinned);
    *   - `input_ids` is exactly `budgetTokens` long — every pack but
    *     the last is full by construction, the last is
    *     [[SpecialTokens.padTo]]-padded;
    *   - `doc_spans` is `array<struct<idCol, start, len>>` in pack
    *     order (`start` 0-based within the pack) — the per-slot
    *     segment-id array a trainer needs to mask cross-document
    *     attention inside a pack, in its compact run-length form.
    *
    * Scale shape: the [[packSequencesByCount]] two-pass prefix sum
    * (distributed), one explode over the packs each document overlaps
    * (≥ 99% of documents touch 1–2 packs), one hash shuffle on pack_id,
    * and bounded per-group state (a pack is ≤ `budgetTokens` ids).
    * NULL `idsCol` rows fail loudly — a missing sequence must not
    * silently shift every later pack boundary. The (idCol, idsCol)
    * projection is persisted INTERNALLY (the operator-persist
    * convention, leaked by design within a query): the NULL guard, the
    * prefix-sum pass, and the pieces join are three consumers, and an
    * expensive upstream (a corpus-wide encode) must evaluate once, not
    * three times (code-review r14).
    */
  def packSequencesWithSpans(df: DataFrame, idCol: String, idsCol: String,
                             sp: graft.operators.SpecialTokens.Ids,
                             budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0,
      s"packSequencesWithSpans: budget must be > 0, got $budgetTokens")
    val B = budgetTokens.toLong
    val in = df.select(col(idCol), col(idsCol))
    // skip the internal persist when the CALLER already persisted df —
    // the projection then scans the cache and a second pin would just
    // double the memory
    val input =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
        val p = in.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      } else in
    val nNull = input.filter(col(idsCol).isNull).count()
    require(nNull == 0,
      s"packSequencesWithSpans: $nNull NULL $idsCol rows — a missing " +
        "sequence would silently shift every later pack boundary; filter " +
        "or fail them upstream")
    val pos = packSequencesByCount(input, idCol,
        size(col(idsCol)).cast(LongType), budgetTokens)
      .select(col(idCol), col("n_tok"),
        (col("pack_id") * B + col("pack_offset")).as("__g"))
    val pieces = input
      .join(pos, Seq(idCol))
      .filter(col("n_tok") > 0)
      .select(col(idCol), col(idsCol), col("__g"), col("n_tok"),
        explode(sequence(expr(s"__g div ${B}L"),
          expr(s"(__g + n_tok - 1) div ${B}L"))).as("pack_id"))
      .withColumn("__ps", greatest(col("pack_id") * B, col("__g")))
      .withColumn("__pe",
        least((col("pack_id") + 1) * B, col("__g") + col("n_tok")))
      .select(col("pack_id"),
        struct(
          (col("__ps") % B).cast("int").as("start"),
          col(idCol),
          (col("__pe") - col("__ps")).cast("int").as("len"),
          slice(col(idsCol), (col("__ps") - col("__g")).cast("int") + 1,
            (col("__pe") - col("__ps")).cast("int")).as("__piece"))
          .as("__m"))
    pieces.groupBy("pack_id")
      .agg(sort_array(collect_list(col("__m"))).as("__ms"))
      .select(col("pack_id"),
        graft.operators.SpecialTokens.padTo(
          flatten(transform(col("__ms"), m => m.getField("__piece"))),
          sp, budgetTokens).as("input_ids"),
        transform(col("__ms"), m => struct(
          m.getField(idCol).as(idCol),
          m.getField("start").as("start"),
          m.getField("len").as("len"))).as("doc_spans"))
  }

  /** Deterministic per-group cap — balanced downsampling ("at most `cap`
    * docs per language/source"), keeping each group's top-`cap` by the
    * portable md5 priority of [[hashSplit]] (uniform-random-like but
    * reproducible), tiebroken by id.
    *
    * Semantically identical to `row_number().over(partitionBy(group)
    * .orderBy(pri, id)) <= cap` — which is exactly what the oracle runs —
    * but NOT executed that way: a popular group would funnel through one
    * partition. Instead the histogram-threshold shape: per-(group, priority
    * bucket) counts to the driver (groups × 1024 rows: metadata-scale,
    * guarded), the cutoff bucket per group computed there, then everything
    * strictly below the cutoff passes with a plain broadcast-map filter and
    * ONLY the boundary bucket (~1/1024 of the group) is ranked exactly.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Long,
                  maxGroups: Int = 4096): DataFrame = {
    require(cap > 0, s"capPerGroup: cap must be > 0, got $cap")
    val base = df
      .withColumn("__pri",
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast(LongType))
      .withColumn("__bkt", shiftright(col("__pri"), 22).cast("int")) // 1024 buckets over 2^32
    val hist = base.groupBy(groupCol, "__bkt").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.getInt(1), r.getLong(2)))
    require(hist.forall(_._1 != null),
      s"capPerGroup: NULL $groupCol values — coalesce them to a sentinel first")
    val groups = hist.map(_._1).distinct
    require(groups.length <= maxGroups,
      s"capPerGroup: ${groups.length} groups exceeds maxGroups=$maxGroups — " +
        "this operator is for coarse strata (language, source); raise " +
        "maxGroups only if groups x 1024 driver rows is acceptable")
    // Per group: cutoff bucket = first bucket where the running count
    // reaches cap; rows in earlier buckets all pass, the cutoff bucket
    // gets the remainder, later buckets drop. Index `hist` by group ONCE —
    // a per-group `hist.filter` rescan is O(groups² × 1024) at the
    // maxGroups guard (~17B comparisons); the grouped index keeps the whole
    // driver pass at O(groups × 1024).
    val byGroup = hist.groupBy(_._1)
    val cuts = groups.map { g =>
      val buckets = byGroup(g).sortBy(_._2)
      var cum = 0L
      var cut = Int.MaxValue // total <= cap: keep the whole group
      var rem = 0L
      buckets.takeWhile { case (_, bkt, n) =>
        if (cum + n >= cap && cut == Int.MaxValue) { cut = bkt; rem = cap - cum }
        cum += n
        cut == Int.MaxValue
      }
      g -> (cut, rem)
    }.toMap
    val gc = col(groupCol).cast("string")
    // ONE entries traversal for keys and values: `cuts.keys.map(lit(...))`
    // builds a SET of Column objects whose identity-hash iteration order
    // silently de-aligns from `cuts.values` — per-group cutoffs then
    // scramble across groups (bit us at sf0.1 where every group was
    // capped; at sf0.01 only one group was, and misalignment hid).
    val entries = cuts.toSeq
    val cutCol = element_at(map_from_arrays(
      array(entries.map(e => lit(e._1.toString)): _*),
      array(entries.map(e => lit(e._2._1)): _*)), gc)
    val remCol = element_at(map_from_arrays(
      array(entries.map(e => lit(e._1.toString)): _*),
      array(entries.map(e => lit(e._2._2)): _*)), gc)
    // ONE branch, not below.union(boundary): the kept set is the same, the
    // plan avoids duplicating the base subtree (the shape Spark 4.1's
    // DeduplicateRelations rewrites — see q_dedup_embed_gate's note), and
    // the window partitions by (group, bucket) — each partition ~1/1024 of
    // a group — with the rank only gating the boundary bucket.
    base.filter(col("__bkt") <= cutCol)
      .withColumn("__rk", row_number().over(Window
        .partitionBy(col(groupCol), col("__bkt"))
        .orderBy(col("__pri"), col(idCol))))
      .filter(col("__bkt") < cutCol || col("__rk") <= remCol)
      .drop("__rk", "__pri", "__bkt")
  }

  /** Deterministic stratified sampling: keep a row iff its md5 priority
    * (the [[hashSplit]] arithmetic, uniform over [0, 2^32)) falls below its
    * group's fraction threshold. A row-local codegen'd filter — no shuffle,
    * no RNG (`df.stat.sampleBy` re-draws per action) — with two properties
    * reproducible data ablations need: growth-stable (a row's fate never
    * changes as the corpus grows) and NESTED (the 10% sample is a strict
    * subset of the 50% sample, because both are prefix intervals of the
    * same priority). Groups absent from `fractions` sample at
    * `defaultFraction`.
    */
  def sampleStratified(df: DataFrame, groupCol: String, idCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction)
        .forall(f => f >= 0.0 && f <= 1.0),
      s"sampleStratified: fractions must be in [0,1], got $fractions / $defaultFraction")
    def th(f: Double): Long = math.round(f * 4294967296.0) // 2^32
    val pri = md5Priority(idCol)
    // entries traversed once — see capPerGroup's note on the keys/values
    // Set-of-Columns de-alignment footgun
    val entries = fractions.toSeq
    val thCol =
      if (entries.isEmpty) lit(th(defaultFraction))
      else coalesce(
        element_at(map_from_arrays(
            array(entries.map(e => lit(e._1)): _*),
            array(entries.map(e => lit(th(e._2))): _*)),
          col(groupCol).cast("string")),
        lit(th(defaultFraction)))
    df.filter(pri < thCol)
  }

  /** TEMPERATURE-flattened source mixture (the mT5 recipe, Xue et al.
    * 2021 §3.1: sample group g with probability ∝ p_g^α, α < 1 boosting
    * low-resource groups that proportional sampling would starve) —
    * [[mixtureSample]] with the weights COMPUTED from the group masses,
    * w_g = n_g^α, instead of supplied. α = 1 degenerates to proportional
    * (uniform fractions); α → 0 approaches equal shares per group.
    *
    * Same scale shape as its sibling: one metadata-scale group-count
    * pull (guarded at 4096 — here the groups come from the DATA, so the
    * guard runs after a limit-bounded collect), then a row-local
    * codegen'd prefix filter; no shuffle of data rows.
    *
    * Oracle portability: w_g is one `pow` on an exact-in-double integer
    * mass (last-ulp class, like the repo's ln/exp terms); Σw runs
    * through DECIMAL(38,18) so it is summation-ORDER-independent — the
    * driver's map order and the oracle's aggregation order cannot
    * diverge — and the fraction keeps [[mixtureSample]]'s left-associated
    * `target·w/Σw/n` double chain, replayed verbatim in SQL.
    */
  def mixtureSampleTemperature(df: DataFrame, groupCol: String, idCol: String,
                               alpha: Double, targetRows: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"mixtureSampleTemperature: alpha must be in (0, 1], got $alpha")
    require(targetRows >= 0,
      s"mixtureSampleTemperature: targetRows must be >= 0, got $targetRows")
    val rows = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .limit(4097).collect()
    require(rows.length <= 4096,
      "mixtureSampleTemperature: more than 4096 groups — the driver-side " +
        "count pull is bounded (capPerGroup's cap); coarsen the grouping")
    val counts = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = counts.map { case (g, n) => g -> math.pow(n.toDouble, alpha) }
    val wSum = w.values
      .map(v => new java.math.BigDecimal(v)
        .setScale(18, java.math.RoundingMode.HALF_UP))
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      .doubleValue()
    val fractions = w.map { case (g, wg) =>
      g -> math.min(1.0, targetRows * wg / wSum / counts(g))
    }
    sampleStratified(df, groupCol, idCol, fractions, defaultFraction = 0.0)
  }

  /** Deterministic SOURCE-MIXTURE resampling — "make the training mix 50%
    * web, 30% books, 20% code": given relative target weights per group
    * and a target corpus size, derive each group's keep-fraction
    * `min(1, targetRows·w_g/Σw / n_g)` and apply [[sampleStratified]]'s
    * md5-priority prefix filter with those fractions. Inherits all of its
    * guarantees: growth-stable, nested (shrinking `targetRows` keeps a
    * subset), seedless, oracle-portable. A group whose target share
    * exceeds its population keeps everything (fraction caps at 1.0) —
    * upsampling by duplication is deliberately out of scope (epoch
    * weights belong in the trainer, not the corpus). Groups present in
    * the data but absent from `weights` drop entirely (share 0 of the
    * mix).
    *
    * Shape: one group-count hash aggregate pulled to the driver —
    * group-cardinality rows, metadata scale, the same boundedness
    * argument as capPerGroup's histogram (require-guarded at 4096
    * groups) — then a row-local codegen'd filter. No shuffle of data
    * rows at any point.
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    weights: Map[String, Double], targetRows: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0)
        && weights.values.sum > 0.0,
      s"mixtureSample: weights must be non-negative with a positive sum, got $weights")
    require(targetRows >= 0, s"mixtureSample: targetRows must be >= 0, got $targetRows")
    require(weights.size <= 4096,
      s"mixtureSample: ${weights.size} groups — the driver-side count pull is " +
        "bounded at 4096 (same cap as capPerGroup); coarsen the grouping")
    val wSum = weights.values.sum
    val counts = df.filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = weights.flatMap { case (g, w) =>
      counts.get(g).map(n => g -> math.min(1.0, targetRows * w / wSum / n))
    }
    sampleStratified(df, groupCol, idCol, fractions, defaultFraction = 0.0)
  }

  /** Deterministic corpus SHUFFLE — the training-order assignment step:
    * every row gets a global position `1..n` in the order of
    * `md5(seed ":" id)` (id as tiebreak, so the order is total even
    * under a hash collision). Seedable and reproducible: the same
    * (corpus, seed) always yields the same order, a different seed an
    * unrelated one — "epoch 2 = reshuffle with seed+1" without RNG
    * state. Downstream, `floor((pos-1)/rowsPerShard)` is a
    * bounded-size shard id for sharded export.
    *
    * Scale shape: the order is materialized by a range-partitioned
    * sort on the hash key (uniform by construction — md5 spreads
    * keys evenly, so range partitions balance regardless of id
    * distribution) and positions are minted by
    * [[graft.functions.RowHash.orderedDenseId]]'s two-pass columnar
    * partition-offset mint — one metadata-scale count pull, no
    * single-partition window, everything stays in whole-stage codegen.
    *
    * Contract: `idCol` must be unique (the same requirement every
    * id-keyed sampler here carries) — duplicate ids share a sort key,
    * so the order BETWEEN those rows is partition-placement-dependent
    * and the determinism guarantee degrades to "deterministic up to
    * duplicate-id ties". Positions land in `posCol`, replacing any
    * existing column of that name.
    */
  def shuffleDeterministic(df: DataFrame, idCol: String, seed: String,
                           posCol: String = "shuffle_pos"): DataFrame = {
    val keyed = df.withColumn("__shuf_key",
      md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
    graft.functions.RowHash
      .orderedDenseId(keyed, Seq(col("__shuf_key"), col(idCol)), posCol)
      .drop("__shuf_key")
  }

  /** [[mixtureSample]] with a TOKEN budget instead of a row budget —
    * how training mixes are actually specified ("30B tokens at
    * 50/30/20"): each group's keep-fraction is
    * `min(1, targetTokens·w_g/Σw / tokens_g)` from one per-group token
    * sum (exact BIGINT aggregate, group-cardinality rows to the
    * driver, same ≤4096 bound), applied through sampleStratified's
    * md5-prefix filter. The kept token count per group is
    * fraction·tokens_g IN EXPECTATION (rows are kept by id-uniform,
    * not knapsack-packed — the standard practice; exact packing is
    * [[packSequences]]' job downstream). Groups with a zero token sum
    * drop (nothing to take). Inherits growth-stability and nesting in
    * `targetTokens`.
    */
  def mixtureSampleByTokens(df: DataFrame, groupCol: String, idCol: String,
                            tokenCol: String, weights: Map[String, Double],
                            targetTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0)
        && weights.values.sum > 0.0,
      s"mixtureSampleByTokens: weights must be non-negative with a positive sum, got $weights")
    require(targetTokens >= 0,
      s"mixtureSampleByTokens: targetTokens must be >= 0, got $targetTokens")
    require(weights.size <= 4096,
      s"mixtureSampleByTokens: ${weights.size} groups — the driver-side sum pull " +
        "is bounded at 4096 (same cap as capPerGroup); coarsen the grouping")
    val wSum = weights.values.sum
    val sums = df.filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(sum(col(tokenCol).cast("long")).as("t"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap // all-NULL tokens -> 0
    val fractions = weights.flatMap { case (g, w) =>
      sums.get(g).filter(_ > 0L)
        .map(t => g -> math.min(1.0, targetTokens * w / wSum / t))
    }
    sampleStratified(df, groupCol, idCol, fractions, defaultFraction = 0.0)
  }

  /** Deterministic PER-ROW-WEIGHTED Bernoulli sample: keep a row iff
    * u(id) < clamp(weight, 0, 1), where u(id) is the md5-derived uniform
    * [[sampleStratified]] already uses (first 8 hex chars / 2^32). The
    * quality-weighted downsampling step of a training-data mix: weight can
    * be any per-row column (quality score, source prior, length penalty) —
    * where stratified sampling needs a closed group domain, this prices
    * every row individually. Same scale properties as its sibling:
    * growth-stable (a row's fate never changes as the corpus grows or
    * other rows appear), seedless-deterministic, oracle-portable, and a
    * pure codegen'd filter — no shuffle, no RNG state, no sort.
    * NULL weights drop the row (no basis to keep it).
    */
  def sampleWeighted(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(md5Priority(idCol).cast(DoubleType) / lit(4294967296.0) <
      least(greatest(weight.cast(DoubleType), lit(0.0)), lit(1.0)))

  /** Overlapping token-window chunking: split each document into windows of
    * `chunkTokens` whitespace tokens advancing by `strideTokens` — the
    * context-window preparation step for embedding / retrieval pipelines
    * (stride < chunk gives overlap so no span falls on a boundary). Pure
    * row-local array arithmetic followed by one `posexplode` — a map-side
    * fan-out, no shuffle, output rows ~ corpus_tokens / stride. Tokens keep
    * their original case (chunking must not alter content). Documents with
    * no tokens produce no chunks. The final (possibly short) window always
    * appears, `n_chunk_tokens` telling its true length.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      s"chunkDocuments: need 0 < stride <= chunk, got $strideTokens/$chunkTokens")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    // chunk starts 0, stride, 2*stride, ... while start < nTok
    // (sequence() DESCENDS when start > stop, so the empty case is guarded)
    val chunks = when(size(col("__toks")) === 0,
        array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0),
          floor((size(col("__toks")) - 1).cast("double") / strideTokens).cast("int")),
        i => concat_ws(" ",
          slice(col("__toks"), i * strideTokens + 1, lit(chunkTokens)))))
    df.withColumn("__toks", toks)
      .select(col(idCol), size(col("__toks")).as("__n"),
        posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_chunk_tokens",
        least(lit(chunkTokens),
          col("__n") - col("chunk_id") * strideTokens).cast("long"))
      .drop("__n")
  }

  /** Quality-quantile filter: keep each group's rows whose score is at or
    * above the group's exact interpolated `quantile` — "drop the bottom
    * 30 % of docs per language by quality score", the relative form of a
    * fixed-threshold quality filter (robust to per-language score-scale
    * differences). One hash aggregate computes the per-group cutoffs
    * (group-cardinality rows, broadcast back), then a row-local filter —
    * no windows, no per-group single-partition rank, so the shape holds on
    * 100 TB strata. Spark's exact `percentile` matches DuckDB's
    * `quantile_cont` bit-for-bit (the parity `q_text_quality_percentiles`
    * already pins). Rows with a NULL group or NULL score drop (inner join
    * + null comparison) — coalesce them to sentinels first if they must
    * survive.
    */
  def filterByGroupQuantile(df: DataFrame, groupCol: String, scoreCol: String,
                            quantile: Double): DataFrame = {
    require(quantile > 0.0 && quantile < 1.0,
      s"filterByGroupQuantile: quantile must be in (0,1), got $quantile")
    val cuts = df.groupBy(groupCol)
      .agg(expr(s"percentile($scoreCol, ${quantile}d)").as("__cut"))
    df.join(broadcast(cuts), Seq(groupCol))
      .filter(col(scoreCol) >= col("__cut"))
      .drop("__cut")
  }
}
