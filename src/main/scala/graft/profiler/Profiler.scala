package graft.profiler

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._

/** Options mirroring the reference's ProfilerOptions surface
  * (profiler_options.py): category cap = the stop-condition, histogram bin
  * count, quantile grid. */
final case class ProfilerOptions(
    maxCategories: Int = 1000,
    histogramBins: Int = 256,
    quantileProbs: Seq[Double] = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
    computeHistograms: Boolean = true,
    computeCategories: Boolean = true,
    computeCorrelation: Boolean = true,
    computeLabels: Boolean = true,
    /** Values per column sent to the entity labeler — the reference caps
      * the labeler sample at 1000 (data_labeler_column_profile.py:34). */
    labelerSampleSize: Int = 1000,
    /** Distinct-char vocabulary per string column
      * (text_column_profile.py:134-157). */
    computeVocab: Boolean = true,
    /** Cap on the stored vocab char set (alphabets are small; the cap
      * guards against binary-garbage columns). */
    vocabCap: Int = 1000,
    /** Row budget for the vocab pass: above this, vocab is computed on a
      * deterministic Bernoulli sample instead of the full scan — the
      * pass's map-side CPU is O(total characters), and the reference
      * computes vocab on its row sample anyway (sampled vocab ⊆ true
      * vocab; alphabets saturate in a few thousand rows). */
    vocabSampleRows: Int = 100000,
    /** Chars scanned per value in the vocab pass — a length cap so one
      * pathological multi-MB value can't dominate the pass. */
    vocabCharsPerValue: Int = 1000,
    /** Natural-scan-order detection per column
      * (order_column_profile.py:374-413). */
    computeOrder: Boolean = true,
    /** Count-min-sketch heavy hitters for over-cap categorical columns
      * (categorical_column_profile.py:523-573). */
    cmsHeavyHitters: Boolean = true,
    cmsEps: Double = 0.001,
    cmsConfidence: Double = 0.99,
    heavyHitterK: Int = 20,
    /** Misra-Gries candidate-summary capacity: any value with frequency
      * > n/(capacity+1) is guaranteed a candidate slot, independent of
      * row order/partition layout (a head sample has no such guarantee
      * on sorted data). */
    hhCandidates: Int = 256,
    /** Relative standard deviation of the HLL NDV sketches — the
      * reference's register_count knob (profiler_options.py:1078-1090).
      * Drives the DataSketches lgK via rsd ≈ 1.04/√(2^lgK); the default
      * 0.008 ≈ 2^14 registers. Also used by the datetime distinct-day
      * estimates. */
    ndvRsd: Double = 0.008,
    /** Sampling floor per column (the reference's min_true_samples,
      * profile_builder.py:640-647): when > 0, [[Profiler.profileSampled]]
      * doubles the sample fraction until every column has at least this
      * many non-null values in the sample (or the sample is the whole
      * table). 0 = the plain max(0.2n, 5000) contract. */
    minTrueSamples: Int = 0,
    /** Per-column NDV cap for EXACT quantiles ([[graft.functions
      * .ExactQuantiles.gated]]): above it the value-histogram shuffle
      * would approach an n-key shuffle on continuous columns, so the
      * column falls back to the GK sketch — the same early-abandon shape
      * as the categorical stop-condition. */
    exactQuantileNdvCap: Long = graft.functions.ExactQuantiles.DefaultNdvCap,
    /** true: histograms via the mergeable HistogramAgg custom aggregate
      * fused into pass 1 (one scan total for all numeric stats); false:
      * a separate exact-range width_bucket pass after min/max are known. */
    singlePassHistograms: Boolean = true,
    /** Global null-sentinel override (profile_builder.py:107-122
      * `null_values`): a regex; string cells matching it are treated as
      * null by EVERY stat in the profile. None = only physical nulls
      * (the default, matching Spark's reader contract). The query-side
      * twin is [[graft.functions.NullSentinelRegex]]. */
    nullValues: Option[String] = None,
    /** Per-column null-sentinel overrides (profile_builder.py:107-122
      * `column_null_values`): column name → regex, taking precedence
      * over [[nullValues]] for that column. Columns absent here use the
      * global setting. */
    columnNullValues: Map[String, String] = Map.empty,
    /** Fail-fast cap on [[Profiler.profileSplit]]'s key cardinality. The
      * split contract is "k chunk profiles" with k SMALL: pass 1 collects
      * one WIDE row per key (HLL sketches + histogram buffers + quantile
      * arrays, ~tens of KB each) and the grouped order pass collects
      * O(partitions × keys × columns) summaries — a high-cardinality id
      * column would OOM the driver instead of erroring. Enforced inside
      * pass 1 itself (a CollectLimit over the grouped aggregation caps
      * the driver fetch at maxGroups+1 rows, then an exact length check
      * errors), so the guard costs zero extra jobs and every later
      * per-key pass inherits the bound. */
    maxGroups: Int = 4096,
    /** Sibling aggregates per pass-1 job. One mega-aggregate generates an
      * update method past the JVM's 8 KB JIT threshold and runs as
      * INTERPRETED bytecode (~10× slower — measured 23 s vs 6 s at sf0.1);
      * chunks of ~30 stay JIT-compiled, and because each chunk only
      * references its own columns, parquet column pruning keeps total
      * I/O at roughly one full-scan equivalent. 0 = unchunked. */
    aggChunkSize: Int = 30,
    /** Caller CONTRACT flag for [[Profiler.profileSplit]]: true asserts
      * the split key's cardinality is bounded by construction (an
      * arithmetic image like `x % k`, a boolean cast, a calendar year —
      * every ProfileQueries composite), so the defensive narrow
      * distinct-count pre-pass that [[maxGroups]] otherwise pays is
      * skipped. That pre-pass is one full (column-pruned) scan of the
      * input PER profileSplit CALL — at corpus scale a real pass, at
      * bench scale 3 AQE jobs per call (r20, guide §1.2: the count is
      * computed only to be thrown away when the caller already knows
      * the bound). A wrong assertion is still caught by an exact
      * post-collect require (after the collect, so it protects
      * correctness, not driver memory — which is why the flag defaults
      * to false and is opt-in per call site). */
    keyDomainBounded: Boolean = false,
    /** Pass-8 head-sample exemplars (5 values/column,
      * profile_builder.py:665-668). The probe is its own bounded
      * limit(100) scan — and under [[Profiler.profileSplit]] it is one
      * scan PER GROUP (each `filter(key === k).limit(100)` job reads
      * until 100 group rows surface). Composite consumers whose emitted
      * output never includes exemplars (the gate/diff/merge oracle
      * queries) turn this off: at bench scale the per-group probes were
      * ~45% of stream_gate's job count, and at corpus scale each probe
      * is a real per-group scan (r19 optimization, guide §1.2 "don't
      * compute things you throw away"). */
    computeExemplars: Boolean = true) {

  /** DataSketches lgConfigK from the rsd contract rsd ≈ 1.04/√m. */
  def ndvLgK: Int = math.max(4, math.min(20, math.round(
    math.log((1.04 / ndvRsd) * (1.04 / ndvRsd)) / math.log(2.0)).toInt))
}

/** Computes a mergeable [[Profile]] of any DataFrame.
  *
  * Execution shape (SURVEY §3 "Spark shape"): the reference's per-column
  * process pools collapse into
  *   pass 1 — ONE `df.agg` where every column contributes sibling aggregate
  *            expressions (count/null/moments/minmax/ndv/quantiles/type
  *            ratios + table-level row stats + correlation co-moments);
  *            Catalyst fuses them into a single scan with map-side partial
  *            aggregation, so cost is one read of the data at any scale.
  *   pass 2 — category counts for low-cardinality string columns, one
  *            melt + groupBy (skipped when nothing qualifies).
  *   pass 3 — fixed-width histogram bucket counts for numeric columns
  *            (bounds from pass 1), one melt + groupBy.
  * Nothing unbounded is collected: category maps are capped, histograms are
  * fixed-width, quantiles use percentile_approx (GK sketch).
  */
object Profiler {

  /** Run the profiler's action set with AQE disabled, restoring the
    * session value after (r20). Every exchange a profile pass plans is
    * bounded-cardinality BY CONSTRUCTION: pass 1 is a partial-agg'd
    * global (or ≤ maxGroups-key) aggregation whose exchange carries one
    * sketch row per map task (per key), the category/vocab melts
    * aggregate map-side to ≤ qualifying-columns × maxCategories rows,
    * and the order pass is map-only. Adaptive re-planning has nothing
    * to coalesce or skew-split on such exchanges at ANY scale, while
    * costing one extra job + scheduling barrier per exchange
    * materialization — at bench scale that was roughly half the
    * profiler composites' job counts (stream_gate trace r20). AQE stays
    * ON session-wide for genuinely adaptive plans (joins, wide
    * shuffles); this scopes the opt-out to the profiler's own jobs.
    * NOTE: session-global for the duration (the connectedComponents
    * caveat) — callers running OTHER queries concurrently on the same
    * SparkSession should profile on spark.newSession(). */
  private def withAqeOff[T](spark: org.apache.spark.sql.SparkSession)(
      f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  /** Incremental profiling (the reference's `update_profile(chunk)`,
    * profile_builder.py:939-998): profile the chunk, merge into the
    * running state. Because every stat in [[Profile]] is mergeable
    * (moments, histograms, category maps, label votes, correlation
    * co-moments), chunk-by-chunk equals whole-data up to the documented
    * approximations (quantiles re-interpolated from the merged
    * histogram, NDV max-bound). */
  def update(state: Option[Profile], chunk: DataFrame,
      opts: ProfilerOptions = ProfilerOptions()): Profile = {
    val p = profile(chunk, opts)
    state.map(_.merge(p)).getOrElse(p)
  }

  /** The reference's default sampling contract (profile_builder.py:843-858,
    * :736-739): stats over `min(n, max(0.2·n, 5000))` rows. At 100 TB the
    * sampling layer IS the cost control — `df.sample` pushes the
    * Bernoulli filter into the scan, so the profile pass reads a fifth of
    * the data with no shuffle. Full-data mode ([[profile]]) remains the
    * oracle-comparable default. */
  def profileSampled(df: DataFrame,
      opts: ProfilerOptions = ProfilerOptions(), seed: Long = 42): Profile = {
    val n = df.count()
    val target = math.max(0.2 * n, 5000.0)
    if (n <= target) return profile(df, opts)
    var frac = target / n
    var sample = df.sample(withReplacement = false, frac, seed)
    // min_true_samples resample loop (profile_builder.py:640-647): the
    // reference keeps drawing until every column has enough non-null
    // values or the data is exhausted. Each probe is one cheap count-agg
    // over the candidate sample; the fraction doubles, so ≤ log2(1/frac)
    // probes before the sample IS the table (all-null columns can never
    // satisfy the floor and stop the loop at frac = 1).
    if (opts.minTrueSamples > 0) {
      val counts = df.schema.fieldNames.map(c => count(col(c)).as(c))
      var enough = false
      while (!enough && frac < 1.0) {
        val r = sample.agg(counts.head, counts.tail: _*).collect()(0)
        enough = (0 until r.length).forall(i => r.getLong(i) >= opts.minTrueSamples)
        if (!enough) {
          frac = math.min(1.0, frac * 2)
          sample = if (frac >= 1.0) df
            else df.sample(withReplacement = false, frac, seed)
        }
      }
    }
    profile(sample, opts)
  }

  def profile(df: DataFrame, opts: ProfilerOptions = ProfilerOptions()): Profile = {
    val names = df.schema.fieldNames
    // duplicates judged case-INSENSITIVELY: Spark's default resolution is
    // case-insensitive, so "ID" vs "Id" is just as ambiguous as "x" vs "x"
    if (names.map(_.toLowerCase).distinct.length == names.length)
      return profileImpl(df, opts)
    // duplicate column names (legal in Spark schemas, e.g. post-join):
    // profile under positional unique aliases and restore the originals
    // afterward — the reference's name→indices multimap equivalent
    // (profile_builder.py:1972-2045). Correlation keys are restored too;
    // a same-name numeric pair keeps the last entry.
    val uniq = names.zipWithIndex.map { case (nm, i) => s"${nm}__pos$i" }
    val restore = uniq.zip(names).toMap
    val p = profileImpl(df.toDF(uniq: _*), opts)
    p.copy(
      columns = p.columns.map(c =>
        c.copy(name = restore.getOrElse(c.name, c.name))),
      correlationState = p.correlationState.map { case ((a, b), m) =>
        (restore.getOrElse(a, a), restore.getOrElse(b, b)) -> m })
  }

  /** Null-sentinel pre-pass (profile_builder.py:107-122): rewrite each
    * string column whose (per-column, else global) sentinel regex
    * matches to a physical null, so every downstream stat — null counts,
    * row has/is-null, categories, lengths, NDV — sees one consistent
    * null definition. A pure projection: it fuses into pass 1's scan,
    * costing nothing extra at any scale. Duplicate column names share
    * one override (they are profiled positionally but named identically,
    * and the reference keys overrides by name too). */
  private def applyNullValues(df: DataFrame, opts: ProfilerOptions): DataFrame = {
    if (opts.nullValues.isEmpty && opts.columnNullValues.isEmpty) return df
    // reference through positional temp names so duplicate column names
    // (legal post-join) never hit an ambiguous col() lookup
    val names = df.schema.fieldNames.toSeq
    val tmp = df.toDF(names.indices.map(i => s"__nv_c$i"): _*)
    val cols = tmp.schema.fields.toSeq.zip(names).map { case (f, orig) =>
      val pat = opts.columnNullValues.get(orig).orElse(opts.nullValues)
      pat match {
        case Some(re) if f.dataType == StringType =>
          when(col(f.name).rlike(re), lit(null: String))
            .otherwise(col(f.name)).as(orig)
        case _ => col(f.name).as(orig)
      }
    }
    tmp.select(cols: _*)
  }

  /** Registered per-column stat plugins, sorted for deterministic agg
    * order — they ride pass 1 as sibling aggregates (same scan). */
  private def activePlugins: Seq[graft.plugins.ColumnStatPlugin] =
    graft.plugins.PluginRegistry
      .all[graft.plugins.ColumnStatPlugin](graft.plugins.ColumnStatPlugin.Typ)
      .values.toSeq.sortBy(_.name)

  /** Pass-1 sibling aggregate expressions for `fields` (per-column stats
    * + table-level row stats, NOT correlation pairs) — shared between the
    * whole-frame path ([[profileImpl]]) and the grouped split path
    * ([[profileSplit]]), where the same expressions run under a
    * `groupBy(splitKey)` so every group's profile comes from ONE scan. */
  private def pass1Cols(fields: Seq[StructField], opts: ProfilerOptions,
      statPlugins: Seq[graft.plugins.ColumnStatPlugin]): Seq[Column] = {
    val histUdaf =
      if (opts.computeHistograms && opts.singlePassHistograms)
        Some(udaf(new HistogramAgg(opts.histogramBins)))
      else None
    val mgUdaf = udaf(new MisraGriesAgg(opts.hhCandidates))
    val perCol: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name); val nm = f.name
      val base = Seq(
        count(c).as(s"${nm}__n"),
        cnt(c.isNull).as(s"${nm}__nulls"),
        // NDV as a DataSketches HLL over value hashes (the sketch BYTES
        // ride in the profile so chunk merges union instead of taking
        // max); the isNotNull gate keeps nulls out of the sketch, and
        // xxhash64 makes any column type sketchable
        hll_sketch_agg(when(c.isNotNull, xxhash64(c)), lit(opts.ndvLgK))
          .as(s"${nm}__ndvsk"))
      val typed = f.dataType match {
        case t if isNumeric(t) =>
          val d = c.cast("double")
          Seq(
            min(d).as(s"${nm}__min"), max(d).as(s"${nm}__max"),
            sum(d).as(s"${nm}__sum"), avg(d).as(s"${nm}__mean"),
            var_pop(d).as(s"${nm}__varp"),
            skewness(d).as(s"${nm}__skew"), kurtosis(d).as(s"${nm}__kurt"),
            cnt(d === 0).as(s"${nm}__zeros"), cnt(d < 0).as(s"${nm}__negs"),
            percentile_approx(d,
              array(opts.quantileProbs.map(lit): _*), lit(10000))
              .as(s"${nm}__quant")) ++
            histUdaf.map(h => h(d).as(s"${nm}__hist")).toSeq
        case StringType =>
          val len = length(c).cast("double")
          Seq(
            min(len).as(s"${nm}__minlen"), max(len).as(s"${nm}__maxlen"),
            avg(len).as(s"${nm}__meanlen"), var_pop(len).as(s"${nm}__varlen"),
            ratioNonNull(c, isIntStr(c)).as(s"${nm}__intr"),
            ratioNonNull(c, isFloatStr(c)).as(s"${nm}__floatr"),
            ratioNonNull(c, isDatetimeStr(c)).as(s"${nm}__dtr")) ++
            (if (opts.cmsHeavyHitters && opts.computeCategories)
              // a few-KB sketch per string column plus a bounded
              // Misra-Gries candidate map, fused into the same scan —
              // the over-cap escape hatch costs no extra pass, and the
              // candidates are unbiased by row order (a heavy hitter
              // first appearing in the last partition is still caught)
              Seq(
                count_min_sketch(c, lit(opts.cmsEps),
                  lit(opts.cmsConfidence), lit(42)).as(s"${nm}__cms"),
                mgUdaf(c).as(s"${nm}__mg"))
            else Seq.empty)
        case t if isDatetime(t) =>
          Seq(
            date_format(min(c), "yyyy-MM-dd HH:mm:ss").as(s"${nm}__mints"),
            date_format(max(c), "yyyy-MM-dd HH:mm:ss").as(s"${nm}__maxts"),
            approx_count_distinct(to_date(c), opts.ndvRsd).as(s"${nm}__ndays"))
        case _ => Seq.empty
      }
      val plugged = statPlugins.filter(_.appliesTo(f.dataType))
        .map(p => p.agg(c).cast("double").as(s"${nm}__plug__${p.name}"))
      base ++ typed ++ plugged
    }

    val anyNull = fields.map(f => col(f.name).isNull.cast("int"))
      .reduce(_ + _)
    val tableLevel = Seq(
      count(lit(1)).as("__rowcount"),
      // DataSketches HLL instead of approx_count_distinct: same one-pass
      // cost, but the sketch BYTES ride along in the Profile so chunk
      // merges union sketches (exact under overlap) instead of clamping
      hll_sketch_agg(
        xxhash64(fields.map(f => col(f.name)): _*), lit(opts.ndvLgK))
        .as("__ndrows_sk"),
      cnt(anyNull > 0).as("__rowhasnull"),
      cnt(anyNull === fields.size).as("__rowisnull"))
    perCol ++ tableLevel
  }

  /** Two-regime chunking of pass-1 aggregates, shared by the whole-frame
    * and split paths (see ProfilerOptions.aggChunkSize): object/
    * imperative aggregates (sketches, histogram Aggregator, CMS, HLL)
    * never whole-stage-codegen and all go in ONE job; declarative
    * aggregates chunk to stay under the JIT method threshold. A marker
    * missing here would silently put an imperative aggregate into a
    * codegen'd chunk — keep the list in this one place. */
  private def pass1Chunks(allAggs: Seq[Column],
      opts: ProfilerOptions): Seq[Seq[Column]] = {
    val objectMarkers =
      Seq("__quant", "__hist", "__cms", "__mg", "__ndv", "__ndays", "__ndrows")
    val (objAggs, declAggs) = allAggs.partition(c =>
      objectMarkers.exists(c.toString.contains))
    val chunkSize = if (opts.aggChunkSize > 0) opts.aggChunkSize else declAggs.size
    declAggs.grouped(chunkSize).toSeq ++
      (if (objAggs.nonEmpty) Seq(objAggs) else Seq.empty)
  }

  /** Grouped (split) profiling: ONE pass-set produces a Profile per
    * distinct value of `splitCol` — the fused form of "profile k chunks
    * of one frame" that [[graft.operators.ProfileQueries]]' merge/diff
    * composites and any partitioned-dataset profiling job want. Running
    * `profile(df.filter(key === k))` k times scans the data k times and
    * pays k× the per-job scheduler cost; here pass 1 (the fused
    * aggregation), pass 2 (categories) and pass 5 (vocab) each run once
    * under `groupBy(splitKey)` — identical aggregate expressions, same
    * map-side partial aggregation, k result rows instead of one — so
    * the scan count is independent of k. The bounded passes (datetime
    * discovery, exemplars: limit(50)/limit(100) probes) stay per-group,
    * preserving profile()'s head-sample semantics exactly.
    *
    * Surface: labels must be off (genuinely whole-frame-shaped — a
    * separate bounded-sample scan); histograms ride the grouped pass 1
    * in single-pass mode (r14), natural-order detection runs as ONE
    * grouped forward pass (r14, OrderDetect.detectNaturalSplit), and
    * correlation co-moments ride the grouped pass 1 (r15) — all equal
    * their per-slice profile() results exactly
    * (ProfileSplitSpec). Vocab row-sampling uses a
    * per-group Bernoulli `rand(42)` filter rather than `df.sample`'s
    * per-partition sampler — same contract (sampled vocab ⊆ true
    * vocab), different draw.
    *
    * Returns one Profile per key VALUE (cast to long); a key absent
    * from the result had zero rows. `splitCol` itself is not profiled. */
  def profileSplit(df0: DataFrame, splitCol: String,
      opts: ProfilerOptions = ProfilerOptions()): Map[Long, Profile] =
    withAqeOff(df0.sparkSession) { profileSplitImpl(df0, splitCol, opts) }

  private def profileSplitImpl(df0: DataFrame, splitCol: String,
      opts: ProfilerOptions): Map[Long, Profile] = {
    require(!opts.computeLabels,
      "profileSplit covers the per-group profile surface: labels are " +
        "whole-frame-shaped (a separate bounded-sample scan) and must " +
        "be disabled")
    require(!opts.computeHistograms || opts.singlePassHistograms,
      "profileSplit histograms require singlePassHistograms: the " +
        "two-pass width_bucket mode is whole-frame-shaped; the " +
        "HistogramAgg buffers ride the grouped pass 1 instead")
    val t0 = System.currentTimeMillis()
    val dfAll = applyNullValues(df0, opts)
    val fields = dfAll.schema.fields.toSeq.filterNot(_.name == splitCol)
    require(fields.size + 1 == dfAll.schema.size,
      s"split column `$splitCol` not found in ${dfAll.schema.fieldNames.toSeq}")
    val keyField = dfAll.schema(splitCol)
    require(isIntegral(keyField.dataType),
      s"split column `$splitCol` must be integral " +
        s"(got ${keyField.dataType.simpleString}): a lossy cast would " +
        "silently merge distinct keys")
    val key = col(splitCol).cast("long")
    // null keys are EXCLUDED everywhere (groupBy would keep a null group
    // that the per-group tail filters could never see — an internally
    // inconsistent Profile); callers split on derived non-null keys
    val df = dfAll.filter(key.isNotNull)
    val statPlugins = activePlugins
    val stringCols = fields.filter(_.dataType == StringType).map(_.name)

    // ---- pass 1: the fused aggregation, grouped by the split key ------
    // Correlation rides the same grouped pass: the pairwise co-moment
    // aggregates are ordinary sibling expressions, so under groupBy(key)
    // each group gets its own mergeable matrix state — identical to what
    // the per-slice profile() computes, at zero extra scans.
    val (corrPairs, corrAggs) = corrPairsAndAggs(
      fields.filter(f => isNumeric(f.dataType)).map(_.name), opts)
    val chunks = pass1Chunks(
      pass1Cols(fields, opts, statPlugins) ++ corrAggs, opts)
    val valsByKey: Map[Long, Map[String, Any]] = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      // Key-domain guard (ProfilerOptions.maxGroups), enforced by one
      // EXACT narrow pre-check BEFORE any wide state ships: a
      // distinct+limit over just the key column bounds the driver fetch
      // at P × (maxGroups+1) EIGHT-BYTE rows (trivial at any sane P/cap),
      // so a caller who splits on a high-cardinality id column gets a
      // fast, exact error instead of a driver OOM. The r15 formulation
      // put the limit on the WIDE grouped aggregation instead — "zero
      // extra scans", but its one-wave fetch could buffer
      // P × (maxGroups+1) wide rows (HLL sketches + histogram buffers +
      // quantile arrays per key) on the driver in the misuse case, i.e.
      // GBs at P=32, cap=4096 — the very failure the guard exists for.
      // One extra narrow pass of the input (column-pruned to the key at
      // the parquet scan) buys the hard driver bound; the wide chunks
      // then collect() PLAIN — no limit machinery, no extra reduce
      // waves — which roughly offsets the added pass in the happy path.
      // Executors still aggregate every group, which is distributed and
      // safe; the hazard being bounded is the driver-side collect. The
      // later passes (categories, vocab, order summaries — the
      // O(P × keys × columns) collect) all key off this pass's result,
      // so they inherit the bound. Counting the limited distinct (not
      // collecting it) keeps even the pre-check's driver traffic to a
      // single long: the partial-agg'd distinct local-limits each map
      // partition to cap+1 keys, the single-partition exchange under
      // GlobalLimit carries ≤ P × (cap+1) 8-byte rows on one EXECUTOR,
      // and the count is exact because the limit can only truncate
      // beyond cap+1 — precisely the region where the require fires
      // anyway.
      // keyDomainBounded (r20): callers whose key is bounded by
      // construction skip this pre-pass — one fewer full narrow scan
      // of the input per call; the exact require after the collect
      // below still catches a wrong assertion (loudly, post-hoc).
      if (!opts.keyDomainBounded) {
        val nKeys = df.select(key.as("__split")).distinct()
          .limit(opts.maxGroups + 1).count()
        require(nKeys <= opts.maxGroups,
          s"profileSplit key `$splitCol` has more than " +
            s"ProfilerOptions.maxGroups=${opts.maxGroups} distinct " +
            "values: the split contract is k SMALL chunk profiles (the " +
            "driver holds one wide stats row per key, plus per-key " +
            "category/vocab/order state). Split on a coarser derived " +
            "key, or raise maxGroups if the driver is sized for it")
      }
      val futs = chunks.map(ch => Future {
        df.groupBy(key.as("__split")).agg(ch.head, ch.tail: _*)
          .collect()
          .map { r =>
            r.getLong(0) -> r.schema.fieldNames.toSeq.zipWithIndex.drop(1)
              .map { case (n, i) => n -> r.get(i) }
          }.toSeq
      })
      Await.result(Future.sequence(futs), Duration.Inf)
        .flatten
        .groupBy(_._1).view.mapValues(_.flatMap(_._2).toMap).toMap
    }
    require(valsByKey.size <= opts.maxGroups,
      s"profileSplit key `$splitCol` realized ${valsByKey.size} distinct " +
        s"values > maxGroups=${opts.maxGroups} — the keyDomainBounded " +
        "assertion at this call site is wrong")
    val keys = valsByKey.keys.toSeq.sorted
    def gdOf(k: Long, name: String): Double = valsByKey(k)(name) match {
      case null => Double.NaN
      case d: Double => d
      case x: Number => x.doubleValue()
    }
    def ndvOf(k: Long, c: String): Long =
      Option(valsByKey(k)(s"${c}__ndvsk").asInstanceOf[Array[Byte]])
        .map(HllOps.estimate).getOrElse(0L)
    val t1 = System.currentTimeMillis()

    // ---- passes 2 + 5 + per-group 7/8: independent actions, submitted
    // concurrently (the same overlap the old per-slice futures had) ----
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global

    // pass 2: category maps, grouped. Qualification is PER GROUP (a
    // column can be categorical in one chunk and over-cap in another);
    // the melt covers the union and the qualification filter runs
    // INSIDE the query (catMelt), so only qualifying (group, column)
    // pairs are ever counted, shuffled, or collected.
    val catColsByKey: Map[Long, Seq[String]] = keys.map(k => k ->
      stringCols.filter(c =>
        opts.computeCategories && ndvOf(k, c) <= opts.maxCategories)).toMap
    val catFut: Future[Map[Long, Map[String, Map[String, Long]]]] = Future {
      if (catColsByKey.values.forall(_.isEmpty)) Map.empty
      else {
        val melted = catMelt(df, key, catColsByKey).collect()
        melted.groupBy(_.getLong(0)).map { case (k, rows) =>
          k -> rows.groupBy(_.getString(1)).map { case (c, rs) =>
            c -> rs.map(r => r.getString(2) -> r.getLong(3)).toMap
          }
        }
      }
    }

    // pass 6: natural-order detection, grouped — ONE forward pass with
    // per-partition per-key accumulators (OrderDetect.detectNaturalSplit);
    // a filter preserves partition structure and row order, so each
    // group's result is exactly what profile(df.filter(key === k)) sees.
    // Awaited with cat/vocab, so its wall rides the divided
    // "categories" window like the other concurrent grouped passes.
    val ordersFut: Future[Map[Long, Map[String, String]]] = Future {
      if (!opts.computeOrder) Map.empty
      else graft.functions.OrderDetect
        .detectNaturalSplit(
          df.select((key +: fields.map(f => col(f.name))): _*),
          fields.map(_.name))
        .map { case (k, m) =>
          k -> m.map { case (c, r) => c -> r.order }
        }
    }

    // pass 5: char vocabulary, grouped
    val vocabFut: Future[Map[Long, Map[String, Set[String]]]] = Future {
      if (!opts.computeVocab || stringCols.isEmpty) Map.empty
      else {
        // per-group Bernoulli sampling where a group exceeds the row
        // budget (the sampled-vocab contract; see scaladoc deviation)
        val overBudget = keys.filter(k =>
          valsByKey(k)("__rowcount").asInstanceOf[Long] > opts.vocabSampleRows)
        val src =
          if (overBudget.isEmpty) df
          else {
            val frac = overBudget.foldLeft(lit(1.0)) { (acc, k) =>
              when(key === k, lit(opts.vocabSampleRows.toDouble /
                valsByKey(k)("__rowcount").asInstanceOf[Long])).otherwise(acc)
            }
            df.filter(rand(42) < frac)
          }
        src.select(key.as("__split"), explode(array(stringCols.map(c =>
          struct(lit(c).as("k"),
            substring(col(c).cast("string"), 1, opts.vocabCharsPerValue)
              .as("v"))): _*)).as("kv"))
          .select(col("__split"), col("kv.k"),
            explode(split(col("kv.v"), "")).as("ch"))
          .filter(col("ch") =!= "")
          .groupBy("__split", "k").agg(
            slice(array_sort(collect_set(col("ch"))), 1, opts.vocabCap)
              .as("chars"))
          .collect()
          .groupBy(_.getLong(0)).map { case (k, rows) =>
            k -> rows.map(r =>
              r.getString(1) -> r.getSeq[String](2).toSet).toMap
          }
      }
    }

    // passes 7–8 per group (bounded limit() probes), each timing ITSELF
    // so Profile.timings carries that group's own tail cost rather than
    // an accumulating await (the cat/vocab window runs concurrently and
    // is attributed once, under "categories"; "vocab" is folded into it)
    val tailFuts = keys.map { k =>
      k -> Future {
        val tStart = System.currentTimeMillis()
        lazy val slice = df.filter(key === k)
          .select(fields.map(f => col(f.name)): _*)
        val dtFormatCols = stringCols.filter(c => gdOf(k, s"${c}__dtr") > 0.0)
        // both probes off → zero per-group jobs (and `slice` stays an
        // unbuilt lazy) — the exemplar probe in particular was one
        // filter+limit scan per (group × call)
        val (dtFormats, strDtStats) =
          if (dtFormatCols.isEmpty)
            (Map.empty[String, Seq[String]], Map.empty[String, DatetimeStats])
          else datetimeDiscovery(slice, dtFormatCols, opts)
        val ex =
          if (opts.computeExemplars) exemplarsOf(slice, fields)
          else Map.empty[String, Seq[String]]
        (dtFormats, strDtStats, ex,
          System.currentTimeMillis() - tStart)
      }
    }.toMap

    val catMapsByKey = Await.result(catFut, Duration.Inf)
    val vocabByKey = Await.result(vocabFut, Duration.Inf)
    val ordersByKey = Await.result(ordersFut, Duration.Inf)
    val t2 = System.currentTimeMillis()

    keys.map { k =>
      val (dtFormats, strDtStats, exemplars, tailMs) =
        Await.result(tailFuts(k), Duration.Inf)
      val histMaps =
        if (opts.computeHistograms && opts.singlePassHistograms)
          histFromPass1(
            fields.filter(f => isNumeric(f.dataType)).map(_.name),
            valsByKey(k))
        else Map.empty[String, Histogram]
      k -> assembleProfile(fields, opts, statPlugins, valsByKey(k), corrPairs,
        catMapsByKey.getOrElse(k, Map.empty), histMaps, Map.empty,
        vocabByKey.getOrElse(k, Map.empty),
        ordersByKey.getOrElse(k, Map.empty),
        dtFormats, strDtStats, exemplars,
        // shared windows (grouped pass 1, concurrent cat/vocab) are
        // DIVIDED across the groups so merging the k split profiles
        // sums back to the actual aggregate wall clock instead of k×
        // it; only the per-group tail probes are attributed whole
        Map("aggregate" -> (t1 - t0) / keys.size.max(1),
          "categories" -> (t2 - t1) / keys.size.max(1),
          "histograms" -> 0L, "labeler" -> 0L,
          "vocab" -> 0L, "order" -> 0L,
          "datetime_formats" -> tailMs))
    }.toMap
  }

  /** The grouped category melt behind [[profileSplit]]'s pass 2, with
    * the per-group qualification pushed INTO the query: the melt covers
    * the union of columns that qualify in ANY group, and the codegen'd
    * InSet filter on the packed (split, column) pair drops every
    * non-qualifying pair BEFORE the count aggregation — so a column
    * that is categorical in one small group but high-cardinality in a
    * big one never counts, shuffles, or collects that big group's
    * distinct values. Collected rows are bounded by
    * Σ_group |qualifying columns(group)| × maxCategories regardless of
    * any group's true cardinality (the qualification map is already
    * known driver-side from pass 1's NDV sketches). Package-private so
    * ProfileSplitSpec can count the pre-collect rows directly. */
  private[graft] def catMelt(df: DataFrame, key: Column,
      catColsByKey: Map[Long, Seq[String]]): DataFrame = {
    val allCatCols = catColsByKey.values.flatten.toSeq.distinct
    val qualPairs = catColsByKey.toSeq.flatMap { case (k, cs) =>
      cs.map(c => s"$k $c")
    }
    df.select(key.as("__split"), explode(array(allCatCols.map(c =>
        struct(lit(c).as("k"), col(c).as("v"))): _*)).as("kv"))
      .select(col("__split"), col("kv.k"), col("kv.v"))
      .filter(col("v").isNotNull &&
        concat(col("__split").cast("string"), lit(" "), col("k"))
          .isin(qualPairs: _*))
      .groupBy("__split", "k", "v").agg(count(lit(1)).as("c"))
  }

  /** Histograms decoded from pass-1 [[HistogramAgg]] buffers (single-pass
    * mode) — shared by the whole-frame path and [[profileSplit]], where
    * the same buffers ride the grouped aggregation (one per group). */
  private def histFromPass1(numericCols: Seq[String],
      vals: Map[String, Any]): Map[String, Histogram] =
    numericCols.flatMap { c =>
      vals(s"${c}__hist").asInstanceOf[Row] match {
        case null => None
        case r =>
          val counts = r.getAs[scala.collection.Seq[Long]]("counts")
          if (counts.isEmpty) None
          else Some(c -> Histogram(
            r.getAs[Double]("lo"), r.getAs[Double]("hi"), counts.toArray))
      }
    }.toMap

  private def profileImpl(df0: DataFrame, opts: ProfilerOptions): Profile =
    withAqeOff(df0.sparkSession) { profileWholeImpl(df0, opts) }

  private def profileWholeImpl(df0: DataFrame, opts: ProfilerOptions): Profile = {
    val t0 = System.currentTimeMillis()
    val df = applyNullValues(df0, opts)
    val fields = df.schema.fields.toSeq
    val statPlugins = activePlugins
    val numericCols = fields.filter(f => isNumeric(f.dataType)).map(_.name)
    val stringCols = fields.filter(_.dataType == StringType).map(_.name)

    val (corrPairs, corrAggs) = corrPairsAndAggs(numericCols, opts)

    // Chunked execution (see pass1Chunks + ProfilerOptions.aggChunkSize):
    // a chunk only reads the columns it references, so parquet pruning
    // keeps total I/O near one full-scan equivalent.
    val chunks = pass1Chunks(
      pass1Cols(fields, opts, statPlugins) ++ corrAggs, opts)
    // chunks submit CONCURRENTLY (Spark schedules parallel actions from
    // separate threads): each chunk scans only its own columns, so
    // overlapping them pipelines I/O and keeps all cores busy — same
    // per-chunk plans and results, ~2× lower wall time than sequential
    // submission at local[32]
    val vals: Map[String, Any] = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val futs = chunks.map(ch => Future {
        val r = df.agg(ch.head, ch.tail: _*).collect()(0)
        r.schema.fieldNames.toSeq.zipWithIndex
          .map { case (n, i) => n -> r.get(i) }
      })
      Await.result(Future.sequence(futs), Duration.Inf).flatten.toMap
    }
    def g[T](name: String): T = vals(name).asInstanceOf[T]
    val ndvCache = scala.collection.mutable.Map.empty[String, Long]
    def ndvSketchOf(c: String): Option[Array[Byte]] =
      Option(vals(s"${c}__ndvsk").asInstanceOf[Array[Byte]])
    def ndvOf(c: String): Long = ndvCache.getOrElseUpdate(c,
      ndvSketchOf(c).map(HllOps.estimate).getOrElse(0L))
    def gd(name: String): Double = vals(name) match {
      case null => Double.NaN
      case d: Double => d
      case x: Number => x.doubleValue()
    }
    val t1 = System.currentTimeMillis()

    // ---- pass 2: category maps for qualifying string columns ----------
    val catCols = stringCols.filter { c =>
      opts.computeCategories && ndvOf(c) <= opts.maxCategories
    }
    val catMaps: Map[String, Map[String, Long]] =
      if (catCols.isEmpty) Map.empty
      else {
        val melted = df.select(explode(array(catCols.map(c =>
          struct(lit(c).as("k"), col(c).as("v"))): _*)).as("kv"))
          .select(col("kv.k"), col("kv.v"))
          .filter(col("v").isNotNull)
          .groupBy("k", "v").agg(count(lit(1)).as("c"))
          .collect()
        melted.groupBy(_.getString(0)).map { case (k, rows) =>
          k -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
        }
      }
    val t2 = System.currentTimeMillis()

    // ---- pass 3: histograms for numeric columns -----------------------
    // Single-pass mode read them from pass 1's HistogramAgg buffers; the
    // two-pass mode re-scans with exact-range width_bucket arithmetic.
    val histMaps: Map[String, Histogram] =
      if (!opts.computeHistograms || numericCols.isEmpty) Map.empty
      else if (opts.singlePassHistograms) {
        histFromPass1(numericCols, vals)
      } else {
        val bins = opts.histogramBins
        val specs = numericCols.flatMap { c =>
          val lo = gd(s"${c}__min"); val hi = gd(s"${c}__max")
          if (lo.isNaN || hi.isNaN || lo == hi) None else Some((c, lo, hi))
        }
        if (specs.isEmpty) Map.empty
        else {
          val melted = df.select(explode(array(specs.map { case (c, lo, hi) =>
            val bucket = least(lit(bins - 1), greatest(lit(0),
              floor((col(c).cast("double") - lit(lo)) / lit((hi - lo) / bins))
                .cast("int")))
            struct(lit(c).as("k"), bucket.as("b"))
          }: _*)).as("kb"))
            .select(col("kb.k"), col("kb.b"))
            .filter(col("b").isNotNull)
            .groupBy("k", "b").agg(count(lit(1)).as("c"))
            .collect()
          val byCol = melted.groupBy(_.getString(0))
          specs.map { case (c, lo, hi) =>
            val counts = Array.fill(bins)(0L)
            byCol.getOrElse(c, Array.empty[Row]).foreach { r =>
              counts(r.getInt(1)) = r.getLong(2)
            }
            c -> Histogram(lo, hi, counts)
          }.toMap
        }
      }
    val t3 = System.currentTimeMillis()

    // ---- pass 4: entity-label votes over a bounded sample -------------
    // The reference sends ≤1000 values per column to its labeler
    // (data_labeler_column_profile.py:34); here the RegexLabeler CASE-WHEN
    // chain labels a limit()-bounded slice of the string columns in one
    // melt + tiny groupBy. The limit caps work regardless of table size.
    val labelVotes: Map[String, Map[String, Long]] =
      if (!opts.computeLabels || stringCols.isEmpty) Map.empty
      else {
        val sample = df
          .select(stringCols.map(col): _*)
          .limit(opts.labelerSampleSize)
        val melted = sample.select(explode(array(stringCols.map(c =>
          struct(lit(c).as("k"), col(c).cast("string").as("v"))): _*)).as("kv"))
          .select(col("kv.k"),
            graft.labelers.RegexLabeler.labelOf(col("kv.v")).as("label"))
          .filter(col("label").isNotNull)
          .groupBy("k", "label").agg(count(lit(1)).as("c"))
          .collect()
        melted.groupBy(_.getString(0)).map { case (k, rows) =>
          k -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
        }
      }
    val t4 = System.currentTimeMillis()

    // ---- pass 5: char vocabulary for string columns --------------------
    // Explode-to-chars then per-column capped distinct-char SET: the
    // shuffle and the collected state are bounded by the alphabet
    // (collect_set dedups map-side); keeping the set (not just its size)
    // makes merge a true set-union (profiler_utils.py:74-92).
    // The pass runs under the sampling contract: map-side CPU is
    // O(characters scanned), so past vocabSampleRows the input is a
    // deterministic Bernoulli sample (pushed into the scan, no shuffle)
    // and each value is length-capped — at 100 TB of text the full-corpus
    // char explode would dwarf every other pass.
    val vocabSrc = {
      val nRows = g[Long]("__rowcount")
      if (nRows > opts.vocabSampleRows)
        df.sample(withReplacement = false,
          opts.vocabSampleRows.toDouble / nRows, 42)
      else df
    }
    val vocabSets: Map[String, Set[String]] =
      if (!opts.computeVocab || stringCols.isEmpty) Map.empty
      else vocabSrc.select(explode(array(stringCols.map(c =>
        struct(lit(c).as("k"),
          substring(col(c).cast("string"), 1, opts.vocabCharsPerValue)
            .as("v"))): _*)).as("kv"))
        .select(col("kv.k"), explode(split(col("kv.v"), "")).as("ch"))
        .filter(col("ch") =!= "")
        .groupBy("k").agg(
          slice(array_sort(collect_set(col("ch"))), 1, opts.vocabCap)
            .as("chars"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[String](1).toSet).toMap
    val t5 = System.currentTimeMillis()

    // ---- pass 6: natural-order detection per column --------------------
    // One map-only scan: per-partition forward summaries + driver seam
    // merge (OrderDetect) — never a global single-partition sort.
    val orders: Map[String, String] =
      if (!opts.computeOrder) Map.empty
      else graft.functions.OrderDetect
        .detectNatural(df, fields.map(_.name))
        .map { case (k, r) => k -> r.order }
    val t6 = System.currentTimeMillis()

    // ---- pass 7: datetime format discovery (string columns) -----------
    val dtFormatCols = stringCols.filter(c => gd(s"${c}__dtr") > 0.0)
    val (dtFormats, strDtStats) = datetimeDiscovery(df, dtFormatCols, opts)
    val t7 = System.currentTimeMillis()

    // ---- pass 8: exemplars from a bounded head sample ------------------
    val exemplars =
      if (opts.computeExemplars) exemplarsOf(df, fields)
      else Map.empty[String, Seq[String]]

    // ---- assemble -----------------------------------------------------
    assembleProfile(fields, opts, statPlugins, vals, corrPairs,
      catMaps, histMaps, labelVotes, vocabSets, orders,
      dtFormats, strDtStats, exemplars,
      Map("aggregate" -> (t1 - t0), "categories" -> (t2 - t1),
        "histograms" -> (t3 - t2), "labeler" -> (t4 - t3),
        "vocab" -> (t5 - t4), "order" -> (t6 - t5),
        "datetime_formats" -> (t7 - t6)))
  }

  /** Mergeable correlation state: pairwise-complete count, means, second
    * moments, and co-moment per pair (six sibling aggs each, still one
    * scan) — so Profile.merge pools instead of dropping the matrix
    * (profile_builder.py:2380-2551). Shared by the whole-frame pass 1
    * and [[profileSplit]]'s grouped pass 1 — under `groupBy(key)` the
    * same expressions yield each group's pairwise state, exactly what
    * `profile(df.filter(key === k))` computes. */
  private def corrPairsAndAggs(numericCols: Seq[String],
      opts: ProfilerOptions): (Seq[(String, String)], Seq[Column]) = {
    val pairs =
      if (opts.computeCorrelation)
        numericCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
      else Seq.empty
    val aggs = pairs.flatMap { case (a, b) =>
      val ca = col(a).cast("double"); val cb = col(b).cast("double")
      val both = ca.isNotNull && cb.isNotNull
      val pa = when(both, ca); val pb = when(both, cb)
      Seq(
        cnt(both).as(s"__corr__${a}__${b}__n"),
        avg(pa).as(s"__corr__${a}__${b}__ma"),
        avg(pb).as(s"__corr__${a}__${b}__mb"),
        var_pop(pa).as(s"__corr__${a}__${b}__va"),
        var_pop(pb).as(s"__corr__${a}__${b}__vb"),
        covar_pop(pa, pb).as(s"__corr__${a}__${b}__cov"))
    }
    (pairs, aggs)
  }

  /** Build the [[Profile]] object from pass results — shared verbatim by
    * the whole-frame and grouped-split paths (the split path calls it
    * once per group with that group's `vals`/pass maps). */
  private def assembleProfile(
      fields: Seq[StructField], opts: ProfilerOptions,
      statPlugins: Seq[graft.plugins.ColumnStatPlugin],
      vals: Map[String, Any], corrPairs: Seq[(String, String)],
      catMaps: Map[String, Map[String, Long]],
      histMaps: Map[String, Histogram],
      labelVotes: Map[String, Map[String, Long]],
      vocabSets: Map[String, Set[String]],
      orders: Map[String, String],
      dtFormats: Map[String, Seq[String]],
      strDtStats: Map[String, DatetimeStats],
      exemplars: Map[String, Seq[String]],
      timings: Map[String, Long]): Profile = {
    def g[T](name: String): T = vals(name).asInstanceOf[T]
    def gd(name: String): Double = vals(name) match {
      case null => Double.NaN
      case d: Double => d
      case x: Number => x.doubleValue()
    }
    val ndvCache = scala.collection.mutable.Map.empty[String, Long]
    def ndvSketchOf(c: String): Option[Array[Byte]] =
      Option(vals(s"${c}__ndvsk").asInstanceOf[Array[Byte]])
    def ndvOf(c: String): Long = ndvCache.getOrElseUpdate(c,
      ndvSketchOf(c).map(HllOps.estimate).getOrElse(0L))
    val tsCols = fields.filter(f => isDatetime(f.dataType)).map(_.name)
    val cols = fields.map { f =>
      val nm = f.name
      val n = g[Long](s"${nm}__n"); val nulls = g[Long](s"${nm}__nulls")
      val ndv = ndvOf(nm)
      val numeric = if (isNumeric(f.dataType)) {
        val varp = gd(s"${nm}__varp"); val skew = gd(s"${nm}__skew")
        val kurt = gd(s"${nm}__kurt")
        val m2 = varp * n
        val m3 = if (skew.isNaN) 0.0 else skew * math.pow(varp, 1.5) * n
        val m4 = if (kurt.isNaN) 0.0 else (kurt + 3.0) * varp * varp * n
        val qs = vals(s"${nm}__quant").asInstanceOf[scala.collection.Seq[Any]] match {
          case null => Map.empty[Double, Double]
          case seq => opts.quantileProbs.zip(seq.map {
            case null => Double.NaN
            case x: Number => x.doubleValue()
          }).toMap
        }
        Some(NumericStats(n, gd(s"${nm}__mean"), m2, m3, m4,
          gd(s"${nm}__min"), gd(s"${nm}__max"), gd(s"${nm}__sum"),
          g[Long](s"${nm}__zeros"), g[Long](s"${nm}__negs"), ndv, qs))
      } else None
      val text = if (f.dataType == StringType) {
        Some(TextStats(gd(s"${nm}__minlen"), gd(s"${nm}__maxlen"),
          gd(s"${nm}__meanlen"), gd(s"${nm}__varlen") * n, n,
          vocabSets.getOrElse(nm, Set.empty)))
      } else None
      // all-null / empty timestamp columns have no min — no stats block;
      // string columns with discovered formats carry their parsed extremes
      val dt = if (tsCols.contains(nm) && g[String](s"${nm}__mints") != null) {
        Some(DatetimeStats(g[String](s"${nm}__mints"), g[String](s"${nm}__maxts"),
          g[Long](s"${nm}__ndays")))
      } else strDtStats.get(nm)
      // Over-cap string columns keep a capped=true marker (the reference's
      // stop-condition flags cap_reached rather than dropping the stat,
      // categorical_column_profile.py:478-521) so Diff can distinguish
      // "capped" from "not categorical". NOTE: the cap decision keys off
      // approx_count_distinct, so nCat for a capped column is the APPROX
      // cardinality (one-pass tradeoff vs the reference's exact stop
      // condition) — Diff consumers must not treat a capped nCat as exact.
      // Capped columns keep CMS heavy hitters: candidate keys come from
      // the pass-1 Misra-Gries summary (guaranteed to hold any value
      // with frequency > n/capacity, whatever the partition layout),
      // counts from the pass-1 CMS sketch — no extra job, no head bias.
      val cat = catMaps.get(nm).map(m =>
        CategoricalStats(m.size.toLong, m, capped = false))
        .orElse(
          if (f.dataType == StringType && opts.computeCategories &&
              ndv > opts.maxCategories) {
            val hh: Map[String, Long] =
              if (!opts.cmsHeavyHitters) Map.empty
              else (vals(s"${nm}__cms").asInstanceOf[Array[Byte]],
                  vals(s"${nm}__mg")) match {
                case (bytes, mg: scala.collection.Map[_, _])
                    if bytes != null =>
                  val sketch = org.apache.spark.util.sketch.CountMinSketch
                    .readFrom(new java.io.ByteArrayInputStream(bytes))
                  mg.keysIterator.map(_.toString).toSeq
                    .map(v => v -> sketch.estimateCount(v))
                    .sortBy { case (v, c) => (-c, v) }
                    .take(opts.heavyHitterK).toMap
                case _ => Map.empty
              }
            Some(CategoricalStats(ndv, Map.empty, capped = true, hh,
              Option(vals(s"${nm}__cms").asInstanceOf[Array[Byte]])))
          } else None)
      val inferred = f.dataType match {
        case t if isNumeric(t) =>
          if (isIntegral(t)) "int" else "float"
        case t if isDatetime(t) => "datetime"
        case StringType =>
          val intr = gd(s"${nm}__intr"); val fr = gd(s"${nm}__floatr")
          val dtr = gd(s"${nm}__dtr")
          if (dtr == 1.0 && n > 0) "datetime"
          else if (intr == 1.0 && n > 0) "int"
          else if (fr == 1.0 && n > 0) "float"
          else if (gd(s"${nm}__maxlen") <= 255.0) "string"
          else "text"
        case other => other.simpleString
      }
      val plugStats = statPlugins.filter(_.appliesTo(f.dataType))
        .flatMap(p => vals.get(s"${nm}__plug__${p.name}") match {
          case Some(null) | None => None
          case Some(v: Number) => Some(p.name -> v.doubleValue())
          case _ => None
        }).toMap
      ColumnProfile(nm, f.dataType.simpleString, inferred, n, nulls, ndv,
        numeric, histMaps.get(nm), cat, text, dt,
        labelVotes.getOrElse(nm, Map.empty),
        orders.get(nm),
        dtFormats.getOrElse(nm, Seq.empty),
        exemplars.getOrElse(nm, Seq.empty),
        ndvSketchOf(nm),
        plugStats)
    }

    val corrMap = corrPairs.map { case (a, b) =>
      val pn = vals(s"__corr__${a}__${b}__n") match {
        case null => 0L
        case x: Number => x.longValue()
      }
      (a, b) -> PairMoments(pn,
        gd(s"__corr__${a}__${b}__ma"), gd(s"__corr__${a}__${b}__mb"),
        gd(s"__corr__${a}__${b}__va") * pn, gd(s"__corr__${a}__${b}__vb") * pn,
        gd(s"__corr__${a}__${b}__cov") * pn)
    }.toMap

    val rowsSk = Option(vals("__ndrows_sk").asInstanceOf[Array[Byte]])
    val ndRows = rowsSk.map(b => math.round(
      org.apache.datasketches.hll.HllSketch.heapify(b).getEstimate))
      .getOrElse(0L)
    Profile(
      g[Long]("__rowcount"), ndRows,
      g[Long]("__rowhasnull"), g[Long]("__rowisnull"),
      cols, corrMap, timings, rowsSk)
  }

  /** Pass 7 (shared): datetime format discovery + parsed extremes for
    * the given string columns. The reference pre-tests 50 rows before
    * the per-format loop (datetime_column_profile.py:392-410); here the
    * 50-row sample IS the discovery set, then parsed min/max use ONLY
    * the discovered formats (no 16-way coalesce on the full data). */
  private def datetimeDiscovery(df: DataFrame, dtFormatCols: Seq[String],
      opts: ProfilerOptions)
      : (Map[String, Seq[String]], Map[String, DatetimeStats]) = {
    val dtFormats: Map[String, Seq[String]] =
      if (dtFormatCols.isEmpty) Map.empty
      else {
        val sample = df.select(dtFormatCols.map(col): _*).limit(50)
        val aggs = dtFormatCols.flatMap { c =>
          graft.functions.DatetimeFormats.formats.zipWithIndex.map {
            case (f, i) =>
              cnt(graft.functions.DatetimeFormats.matches(col(c), f))
                .as(s"${c}__fmt$i")
          }
        }
        val r = sample.agg(aggs.head, aggs.tail: _*).collect()(0)
        dtFormatCols.map { c =>
          c -> graft.functions.DatetimeFormats.formats.zipWithIndex
            .filter { case (_, i) => r.getAs[Long](s"${c}__fmt$i") > 0 }
            .map(_._1.java)
        }.toMap
      }
    val strDtStats: Map[String, DatetimeStats] = {
      val parseCols = dtFormats.filter(_._2.nonEmpty)
      if (parseCols.isEmpty) Map.empty
      else {
        val aggs = parseCols.toSeq.flatMap { case (c, fmts) =>
          val parsed = coalesce(fmts.map(fm =>
            try_to_timestamp(col(c), lit(fm))): _*)
          Seq(
            date_format(min(parsed), "yyyy-MM-dd HH:mm:ss")
              .as(s"${c}__smints"),
            date_format(max(parsed), "yyyy-MM-dd HH:mm:ss")
              .as(s"${c}__smaxts"),
            approx_count_distinct(to_date(parsed), opts.ndvRsd)
              .as(s"${c}__sndays"))
        }
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        parseCols.keySet.flatMap { c =>
          Option(r.getAs[String](s"${c}__smints")).map(mn =>
            c -> DatetimeStats(mn, r.getAs[String](s"${c}__smaxts"),
              r.getAs[Long](s"${c}__sndays")))
        }.toMap
      }
    }
    (dtFormats, strDtStats)
  }

  /** Pass 8 (shared): 5 exemplar values per column from a bounded head
    * sample (profile_builder.py:665-668). */
  private def exemplarsOf(df: DataFrame,
      fields: Seq[StructField]): Map[String, Seq[String]] = {
    val exemplarRows = df.limit(100).collect()
    fields.zipWithIndex.map { case (f, idx) =>
      f.name -> exemplarRows.iterator
        .map(_.get(idx)).filter(_ != null).map(_.toString)
        .toSeq.distinct.take(5)
    }.toMap
  }

  private def isNumeric(t: DataType): Boolean = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DoubleType | _: FloatType | _: DecimalType => true
    case _ => false
  }
  private def isIntegral(t: DataType): Boolean = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
    case _ => false
  }
  private def isDatetime(t: DataType): Boolean = t match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }
}
