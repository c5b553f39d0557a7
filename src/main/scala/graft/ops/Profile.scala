package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE-statistics surface: per-column null
  * counts, distinct cardinality, and min/max in ONE scan.
  *
  * The DEFAULT distinct estimator is HyperLogLog++
  * (`approx_count_distinct`): each column is a regular aggregate with
  * bounded sketch state, so N columns profile in one narrow pass with NO
  * Expand — the shape that survives 100 TB. `exact = true` switches to
  * `count(distinct …)`, which plans through Catalyst's Expand (rows
  * replicated once per distinct-aggregate); exact mode is for modest
  * inputs or when the profile itself is the deliverable — at 100 TB an
  * N-column exact profile multiplies the scan N× through the Expand and
  * is the one genuine scale-killer this module can produce, which is why
  * it is opt-in rather than the default. Profiles feed CBO-style
  * decisions (broadcast-ability, skew suspicion, null-heavy columns) and
  * data-quality gates; for re-mergeable incremental profiles keep the
  * raw sketches instead ([[Sketches.hllBuild]] register tables,
  * [[Sketches.hllMerge]] to roll up, [[Sketches.hllEstimate]] /
  * [[Sketches.hllEstimateBy]] to close).
  *
  * Output is long-format `(column, n_rows, n_nulls, n_distinct, min_val,
  * max_val)` — min/max computed on the native type, rendered as strings
  * so heterogeneous columns stack into one frame.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = false, rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def dist(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), rsd)
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        dist(c).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // stack the wide single row into one row per column
    val stackExpr = cols.map { c =>
      s"'$c', `__nulls_$c`, `__dist_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.length}, $stackExpr) AS " +
          "(column, n_nulls, n_distinct, min_val, max_val)")
      .select(col("column"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Equi-width histogram of a numeric column: `nBuckets` buckets spanning
    * [min, max], the distribution half of a profile (skew detection,
    * boundary picks for range partitioning). Two passes over the column:
    * a 1-row min/max aggregate broadcast onto the scan, then one
    * hash aggregation on the bucket id — both shapes flat at 100 TB.
    * The top bucket is closed ([lo, max]) so the max value lands in
    * bucket nBuckets−1; a constant column degenerates to one bucket.
    * Empty buckets are absent from the output (it is an aggregation,
    * not a fill — compose with [[graft.ops.Temporal]] gap-fill if a
    * dense axis is needed). */
  /** Equi-depth (equal-frequency) histogram: `nBuckets` buckets holding
    * ~equal row counts, boundaries at the k/nBuckets quantiles — the CBO
    * statistic for skewed columns where equi-width buckets collapse.
    * Two passes, NO global sort: one exact-percentile aggregate (1 row,
    * broadcast) then one comparison-vector bin + hash agg — the same
    * 100 TB shape as [[histogram]]. A value equal to a boundary bins
    * upward; heavy single values may straddle fewer distinct buckets
    * than requested (their count shows the skew — that is the point). */
  def equiDepthHistogram(df: DataFrame, c: String,
      nBuckets: Int = 10, exact: Boolean = true): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val v = col(c).cast("double")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // exact `percentile` buffers the column per aggregation group — fine
    // to ~10^8 rows; beyond that pass exact = false for the t-digest
    // sketch (`percentile_approx`): boundaries shift within sketch error
    // but the two-pass bin shape is identical
    val bounds =
      if (exact) exactPercentiles(df, v, probs)
      else df.agg(percentile_approx(v, lit(probs), lit(10000)).as("__qs"))
    // bucket = |{q ∈ __qs : v ≥ q}|. The lambda-HOF spelling
    // (`size(filter(__qs, q => v >= q))`) is CodegenFallback — interpreted
    // once per ROW over the whole input; __qs has a fixed, small length
    // (nBuckets−1), so unroll it into a static sum of comparisons that
    // stays inside whole-stage codegen (round 9, guide §4/§1)
    val bucket = probs.indices
      .map(i => when(col("__v") >= element_at(col("__qs"), i + 1), 1L)
        .otherwise(0L))
      .reduce(_ + _)
    df.join(broadcast(bounds))
      .select(v.as("__v"), col("__qs"))
      .select(col("__v"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  /** Exact percentiles of a double column, DISTRIBUTED — bit-identical to
    * Spark's `percentile(v, probs)` but without its single aggregation
    * buffer (the builtin collects a value→count map per partial and
    * merges + sorts the whole distinct-value set in ONE task — its own
    * contract caps it around 10^8 rows, this module's one documented
    * scale ceiling until round 9).
    *
    * Shape (guide §2): one map-side-combined `groupBy(value)` count, a
    * RANGE repartition so every partition owns a contiguous value
    * interval, per-partition cumulative counts via a window PARTITIONED
    * by `spark_partition_id()` (parallel — never a global single-task
    * window), partition offsets from a partition-count-sized aggregate,
    * and one broadcast-nested-loop probe of the (tiny) percentile
    * position list against the cumulative table. No driver-side data, no
    * O(distinct) buffer on any single task.
    *
    * Bit-identity with the builtin, replicated step for step:
    * `position = p · (n−1)` (double product of the exact operands),
    * bracketing order statistics at `floor(position)` / `ceil(position)`
    * over the value-sorted multiset, result = the order statistic itself
    * when the two indices or the two values coincide, else
    * `(ceil−pos)·vLow + (pos−floor)·vHigh` — the builtin's exact
    * special-cases and interpolation expression, same IEEE operation
    * order. Returns a 1-row frame with `__qs` = array in `probs` order
    * (null entries never arise for non-empty input; empty input returns
    * an empty frame, which downstream joins propagate like the
    * builtin's null). */
  def exactPercentiles(df: DataFrame, v: Column,
      probs: Array[Double]): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint PINS the range partitioning: `counts` feeds three
    // branches (local cumsum, per-pid offsets, total) whose correctness
    // requires every branch to observe the SAME partition ids. Without
    // it that held only via Spark's exchange reuse — RangePartitioner
    // samples with an RDD-id-derived seed, so with exchange reuse
    // disabled (or canonicalization divergence) branches could get
    // DIFFERENT partitionings and silently wrong percentiles (ADVICE
    // round 9). The checkpoint materializes once and every branch reads
    // the same frozen blocks.
    val counts = df.select(v.as("__v")).where(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .repartitionByRange(nPart, col("__v"))
      .select(col("__v"), col("__c"), spark_partition_id().as("__pid"))
      .localCheckpoint()
    val wPart = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = counts
      .withColumn("__lcum", sum(col("__c")).over(wPart))
    // O(partitions) offsets: cumulative partition totals, exclusive
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.groupBy(col("__pid"))
      .agg(sum(col("__c")).as("__ptot"))
      .select(col("__pid"),
        coalesce(sum(col("__ptot")).over(wOff), lit(0L)).as("__off"),
        col("__ptot"))
    val total = offs.agg(sum(col("__ptot")).as("__n"))
    // cum = 0-based EXCLUSIVE end position of this value's run; the run
    // covers positions [cum − c, cum)
    val glob = local.join(broadcast(offs.select(col("__pid"), col("__off"))),
        Seq("__pid"))
      .select(col("__v"), col("__c"), (col("__lcum") + col("__off")).as("__cum"))
    val probeRows = probs.zipWithIndex.map { case (p, i) => (i, p) }.toSeq
    val probes = spark.createDataFrame(probeRows).toDF("__i", "__p")
      .crossJoin(broadcast(total))
      .select(col("__i"), col("__p"),
        (col("__p") * (col("__n") - 1L)).as("__pos"))
      .select(col("__i"), col("__pos"),
        floor(col("__pos")).cast("long").as("__lo"),
        ceil(col("__pos")).cast("long").as("__hi"))
    val hit = glob.join(broadcast(probes),
      (col("__lo") >= col("__cum") - col("__c") && col("__lo") < col("__cum")) ||
        (col("__hi") >= col("__cum") - col("__c") && col("__hi") < col("__cum")))
    val picked = hit.groupBy(col("__i"))
      .agg(
        first(col("__pos")).as("__pos"),
        first(col("__lo")).as("__lo"),
        first(col("__hi")).as("__hi"),
        min(when(col("__lo") >= col("__cum") - col("__c") &&
          col("__lo") < col("__cum"), col("__v"))).as("__vlo"),
        min(when(col("__hi") >= col("__cum") - col("__c") &&
          col("__hi") < col("__cum"), col("__v"))).as("__vhi"))
      .select(col("__i"),
        when(col("__lo") === col("__hi") || col("__vlo") === col("__vhi"),
          col("__vlo"))
          .otherwise(
            (col("__hi") - col("__pos")) * col("__vlo") +
              (col("__pos") - col("__lo")) * col("__vhi")).as("__q"))
    picked
      .agg(sort_array(collect_list(struct(col("__i"), col("__q")))).as("__s"))
      .select(expr("transform(__s, x -> x.__q)").as("__qs"))
  }

  def histogram(df: DataFrame, c: String, nBuckets: Int = 20): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val bounds = df.agg(min(col(c).cast("double")).as("__mn"),
      max(col(c).cast("double")).as("__mx"))
    val w = (col("__mx") - col("__mn")) / lit(nBuckets)
    val v = col(c).cast("double")
    df.join(broadcast(bounds))
      .select(
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(floor((v - col("__mn")) / w),
            lit(nBuckets - 1)).cast("long")).as("bucket"),
        col("__mn"), col("__mx"))
      .select(col("bucket"),
        round(col("__mn") + col("bucket") * w, 6).as("lo"),
        round(col("__mn") + (col("bucket") + 1) * w, 6).as("hi"))
      .groupBy("bucket", "lo", "hi")
      .agg(count(lit(1)).as("n"))
  }
}
