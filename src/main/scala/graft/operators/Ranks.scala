package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed ranking for LOW-CARDINALITY window partitions.
  *
  * `row_number().over(Window.partitionBy(g).orderBy(o))` funnels each
  * group through one task — with a 3-value group key the whole table runs
  * on 3 tasks at any cluster size. This utility decomposes the same rank
  * the way q04 decomposes the sortedness check: range-partition on
  * (g, o) so every task holds a bounded, contiguous slice, SORT WITHIN
  * the slice once, rank/accumulate within each slice by one streaming
  * partition-local pass; then add per-slice offsets (a slice-count
  * relation of k×|groups| rows, k = partition count — independent of data
  * volume) broadcast back.
  *
  * Output is identical to the single-window formulation whenever
  * `orderCols` is a total order within each group (the same requirement
  * any deterministic row_number has).
  *
  * EVALUATION: the decomposition references the range-sliced relation
  * twice (local ranks and slice offsets), exchange reuse does not fire
  * for the two branches, and `_slice` labels come from
  * spark_partition_id() over a SAMPLED range exchange — two independent
  * evaluations could sample different boundaries and silently drop rows
  * at the `_slice` join. The decomposition therefore PINS its own slice
  * boundaries: pinSliced materializes the sliced relation
  * (Io.materialize) so both branches read one block-backed evaluation.
  * Callers need no input pre-materialization for correctness — any
  * deterministic-or-not input is safe.
  *
  * EXECUTION SHAPE (r16 optimization, guide §2.4 "remove shuffles
  * outright"): the r15 form computed the slice-local rank with
  * `Window.partitionBy(_slice, group)`, whose required distribution is
  * hash(_slice, group) — Catalyst cannot see that the range exchange
  * already co-located every (_slice, group), so WindowExec re-shuffled
  * and re-sorted the ENTIRE relation a second time. The r16 form sorts
  * once inside the range exchange (sortWithinPartitions — the same sort
  * WindowExec used to do after its redundant exchange) and computes the
  * slice-local rank / prefix aggregate with a zero-shuffle streaming
  * mapPartitions pass over the pinned, sorted blocks: per-group state
  * resets on group change (groups are contiguous — the slice is sorted
  * with `group` leading). Measured at sf0.1 this removes one full-data
  * Exchange + Sort from every entry point (plan diff in plans/r16);
  * at cluster scale it halves the decomposition's shuffled bytes.
  * Decimal-typed running aggregates keep the windowed form (fallback
  * below) so Spark's decimal sum semantics stay bit-identical.
  *
  * MULTI-CONSUMER OUTPUT: what callers still own is the ranked OUTPUT's
  * reuse — a query that feeds the SAME ranked relation to several
  * downstream consumers re-runs the rank per consumer unless it
  * materializes the output once (the q233 lesson: its first layout
  * re-derived a data-sized rank per consumer; the rebuilt version
  * materializes one bounded relation).
  */
object Ranks {

  /** Range-slice, sort within the slice, and PIN: one evaluation, one
    * boundary set (see the object scaladoc — the downstream reads must
    * agree). The slice sort keys lead with `group`, so each group's rows
    * are contiguous inside a slice — the property the streaming local
    * pass relies on. */
  private def pinSliced(df: DataFrame, keys: Seq[Column]): DataFrame =
    graft.sources.Io.materialize(
      df.repartitionByRange(keys: _*)
        .sortWithinPartitions(keys: _*)
        .withColumn("_slice", spark_partition_id()))

  /** One zero-shuffle streaming pass over the pinned sorted slices:
    * appends `extra` columns computed by a per-group accumulator that is
    * re-created whenever the group value changes (groups are contiguous
    * within a sorted slice; a slice boundary is a partition boundary, so
    * state never crosses it). `mk` builds the per-group row function.
    *
    * r17 REWRITE: the pass now runs on InternalRow over
    * `queryExecution.toRdd` and rebuilds the DataFrame through
    * GraftSqlShim.internalCreateDataFrame. The r16 form
    * (Dataset.mapPartitions + Encoders.row) round-tripped every row
    * through EXTERNAL objects — UTF8String→String, DateType→
    * java.sql.Date, Decimal→BigDecimal on the way out and back — and
    * the r17 sf1 A/B (spark.graft.ranks.stream on/off, adjacent JVMs,
    * 15 Ranks consumers) measured that boxing at 1.1–1.5× of WHOLE-query
    * wall time: the windowed fallback with its extra full-data
    * Exchange+Sort was beating the streaming pass locally. The
    * InternalRow form emits one reused JoinedRow(input, extras) per row
    * (the scan exec's UnsafeProjection materializes it immediately) —
    * no per-field conversion at all.
    *
    * Row-reuse contract: upstream `toRdd` iterators may reuse the input
    * row buffer, so the group value is defensively copied when stored
    * across rows, and nothing else is retained. */
  private def streamPass(sliced: DataFrame, group: String,
      extra: Seq[StructField])(
      mk: () => org.apache.spark.sql.catalyst.InternalRow => Seq[Any])
      : DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    val schema = StructType(sliced.schema.fields ++ extra)
    val gi = sliced.schema.fieldIndex(group)
    val gType = sliced.schema(group).dataType
    val si = sliced.schema.fieldIndex("_slice")
    val nExtra = extra.size
    val rdd = sliced.queryExecution.toRdd.mapPartitions { it =>
      // Invariant guard (r17, ADVICE r16): correctness of the streaming
      // pass depends on Io.materialize preserving the checkpointed RDD's
      // partition index (row._slice == this task's partition id) so that
      // local ranks and the broadcast per-slice offsets line up. True for
      // local/reliable checkpoint today; if a future materialize change
      // (cache+count, parquet round-trip, coalescing) breaks it, fail
      // loudly here instead of producing silently wrong global ranks.
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val extras = new Array[Any](nExtra)
      val extrasRow = new GenericInternalRow(extras)
      val joined = new JoinedRow
      var cur: Any = null
      var started = false
      var f: InternalRow => Seq[Any] = null
      it.map { r =>
        if (r.getInt(si) != pid) throw new IllegalStateException(
          s"Ranks.streamPass: _slice=${r.getInt(si)} read in partition " +
            s"$pid — materialization no longer preserves partition order")
        val g = r.get(gi, gType)
        if (!started || !java.util.Objects.equals(g, cur)) {
          f = mk()
          // copy object-typed group values: the input row buffer may be
          // reused by the upstream iterator after next()
          cur = g match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case s: InternalRow => s.copy()
            case other => other
          }
          started = true
        }
        val ex = f(r)
        var i = 0
        while (i < nExtra) { extras(i) = ex(i); i += 1 }
        joined(r, extrasRow): InternalRow
      }
    }
    org.apache.spark.sql.GraftSqlShim.internalCreateDataFrame(
      sliced.sparkSession, rdd, schema)
  }

  /** Unboxed long/double field accessors for the streaming accumulators
    * (InternalRow getters are type-specific). */
  private def longGetter(dt: DataType, i: Int)
      : org.apache.spark.sql.catalyst.InternalRow => Long = dt match {
    case ByteType => r => r.getByte(i).toLong
    case ShortType => r => r.getShort(i).toLong
    case IntegerType => r => r.getInt(i).toLong
    case LongType => r => r.getLong(i)
    case other => throw new IllegalArgumentException(s"not integral: $other")
  }

  private def doubleGetter(dt: DataType, i: Int)
      : org.apache.spark.sql.catalyst.InternalRow => Double = dt match {
    case FloatType => r => r.getFloat(i).toDouble
    case DoubleType => r => r.getDouble(i)
    case other => throw new IllegalArgumentException(s"not fractional: $other")
  }

  /** Streaming accumulators cover exactly the types whose Spark window
    * `sum`/`max` semantics a sequential in-order Long/Double fold
    * reproduces bit-for-bit (integral sums wrap like non-ANSI Spark;
    * double sums add in the same slice order the window would). Decimal
    * and everything else take the windowed fallback. */
  private def streamableSum(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType => true
    case _ => false
  }

  /** Spark's `sum` result type for a streamable input type. */
  private def sumType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case _ => DoubleType
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** A/B escape hatch while the r16 optimization round measures the
    * streaming pass against the r15 windowed form on real queries
    * (set spark.graft.ranks.stream=false to force the windowed form). */
  private def streamEnabled(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.ranks.stream")
      .forall(_.toBoolean)

  /** Slice-local rank plus the k×|groups| slice-count relation — the
    * shared core of rowNumber and quantilesCont. */
  private def rankedLocal(df: DataFrame, group: String,
      orderCols: Seq[Column]): (DataFrame, DataFrame) = {
    val sliced = pinSliced(df, col(group) +: orderCols)
    val local =
      if (streamEnabled(df))
        streamPass(sliced, group,
          Seq(StructField("_lrn", IntegerType, nullable = false))) { () =>
          var rn = 0
          _ => { rn += 1; Seq(rn) }
        }
      else sliced.withColumn("_lrn", row_number().over(
        Window.partitionBy(col("_slice"), col(group)).orderBy(orderCols: _*)))
    val sliceCounts = sliced.groupBy(col("_slice"), col(group))
      .agg(count(lit(1)).as("_n"))
    (local, sliceCounts)
  }

  /** offset = rows of the same group in earlier slices (k×|groups| rows,
    * broadcast back). */
  private def offsetsOf(sliceCounts: DataFrame, group: String): DataFrame =
    sliceCounts
      .withColumn("_off", sum(col("_n")).over(
        Window.partitionBy(col(group)).orderBy(col("_slice"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_slice"), col(group),
        coalesce(col("_off"), lit(0L)).as("_off"))

  /** Exact interpolated p-quantile per group (quantile_cont semantics:
    * value at position (n−1)p, linear interpolation between the two
    * straddling rows). Built on the slice decomposition, so the
    * per-group sort runs as parallel range-partitioned local sorts
    * instead of one task per group — the scale replacement for the
    * built-in `percentile`, which sorts each group single-threaded.
    * Returns (group, as).
    *
    * NULL values are excluded before ranking, matching `percentile` /
    * `quantile_cont`. One divergence: a group whose values are ALL null
    * is absent from the result (the built-ins emit a null row) — callers
    * with such groups should left-join this relation. */
  def quantileCont(df: DataFrame, group: String, value: Column, p: Double,
      as: String): DataFrame =
    quantilesCont(df, group, value, Seq(p -> as))

  /** Several quantiles of the SAME value relation in ONE rank pass: the
    * expensive part of quantileCont is ranking (a range shuffle + local
    * sorts); the interpolation is k-row arithmetic. Callers needing
    * p50+p90 (q116) or three quartiles (q85) pay one rank instead of
    * one per quantile. Per-p interpolation is the formula of the
    * single-p form verbatim, so results are value-identical.
    *
    * r16: the per-group row count comes from the k×|groups| slice-count
    * relation instead of a data-sized aggregate over the ranked output —
    * the ranked relation now has exactly ONE consumer (the probe join),
    * so the rank is evaluated once, not twice. */
  def quantilesCont(df: DataFrame, group: String, value: Column,
      ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty)
    val (local, sliceCounts) = rankedLocal(
      df.select(col(group), value.as("_v")).filter(col("_v").isNotNull),
      group, Seq(col("_v")))
    val ranked = local.join(broadcast(offsetsOf(sliceCounts, group)),
        Seq("_slice", group))
      .withColumn("_rn", (col("_lrn") + col("_off")).cast("int"))
    val counts0 = sliceCounts.groupBy(col(group)).agg(sum(col("_n")).as("_n"))
    val counts = ps.zipWithIndex.foldLeft(counts0) {
      case (acc, ((p, _), i)) =>
        acc.withColumn(s"_pos$i", (col("_n") - 1) * p)
          .withColumn(s"_lo$i", floor(col(s"_pos$i")).cast("int") + 1)
          .withColumn(s"_frac$i", col(s"_pos$i") - floor(col(s"_pos$i")))
    }
    val needed = ps.indices
      .map(i => col("_rn") === col(s"_lo$i") || col("_rn") === col(s"_lo$i") + 1)
      .reduce(_ || _)
    val aggs = ps.zipWithIndex.flatMap { case (_, i) =>
      Seq(min(when(col("_rn") === col(s"_lo$i"), col("_v"))).as(s"_lov$i"),
        min(when(col("_rn") === col(s"_lo$i") + 1, col("_v"))).as(s"_hiv$i"),
        first(col(s"_frac$i")).as(s"_f$i"))
    }
    ranked.join(broadcast(counts), group)
      .filter(needed)
      .groupBy(col(group))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(group) +: ps.zipWithIndex.map { case ((_, as), i) =>
        (col(s"_lov$i") + col(s"_f$i")
          * (coalesce(col(s"_hiv$i"), col(s"_lov$i")) - col(s"_lov$i"))).as(as)
      }: _*)
  }

  /** Distributed running (prefix) sum: equivalent to
    * `sum(value).over(partitionBy(group).orderBy(orderCols).rowsBetween(
    * unboundedPreceding, currentRow))` but decomposed like rowNumber —
    * local cumulative sums inside bounded range slices plus a broadcast
    * per-slice total offset. The third member of the decomposition family
    * (rank / quantile / prefix-aggregate); works for any algebraic
    * aggregate, instantiated here for sum. */
  def runningSum(df: DataFrame, group: String, orderCols: Seq[Column],
      value: Column, as: String): DataFrame =
    runningSums(df, group, orderCols, Seq(value -> as))

  /** runningSum for SEVERAL value columns of the same relation in ONE
    * range shuffle: the expensive part is the range repartition + local
    * sort; each additional running sum is one more accumulator riding the
    * same slice-local streaming pass and the same k-row offsets relation.
    * Callers needing two parallel CDFs (q141) pay one shuffle instead of
    * two. Per-value semantics are runningSum's verbatim (including the
    * typed zero on the offset coalesce). */
  def runningSums(df: DataFrame, group: String, orderCols: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    require(values.nonEmpty)
    val keys = col(group) +: orderCols
    val sliced = values.zipWithIndex.foldLeft(pinSliced(df, keys)) {
      case (acc, ((v, _), i)) => acc.withColumn(s"_v$i", v)
    }
    val vTypes = values.indices.map(i => sliced.schema(s"_v$i").dataType)
    val local =
      if (vTypes.forall(streamableSum) && streamEnabled(df)) {
        val vIdx = values.indices.map(i => sliced.schema.fieldIndex(s"_v$i"))
        val integral = vTypes.map(isIntegral).toArray
        val getL = values.indices.map(i =>
          if (integral(i)) longGetter(vTypes(i), vIdx(i)) else null).toArray
        val getD = values.indices.map(i =>
          if (!integral(i)) doubleGetter(vTypes(i), vIdx(i)) else null).toArray
        val extra = values.indices.map(i =>
          StructField(s"_run$i", sumType(vTypes(i)), nullable = true))
        val nv = values.size
        streamPass(sliced, group, extra) { () =>
          val accL = new Array[Long](nv)
          val accD = new Array[Double](nv)
          val seen = new Array[Boolean](nv)
          r => (0 until nv).map { i =>
            if (!r.isNullAt(vIdx(i))) {
              seen(i) = true
              if (integral(i)) accL(i) += getL(i)(r)
              else accD(i) += getD(i)(r)
            }
            if (!seen(i)) null
            else if (integral(i)) java.lang.Long.valueOf(accL(i))
            else java.lang.Double.valueOf(accD(i))
          }
        }
      } else {
        // decimal (and any exotic) running sums keep Spark's own window
        // aggregation semantics — slice-local window over the pinned
        // relation, exactly the r15 shape
        val w = Window.partitionBy(col("_slice"), col(group))
          .orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        values.indices.foldLeft(sliced) { (acc, i) =>
          acc.withColumn(s"_run$i", sum(col(s"_v$i")).over(w))
        }
      }
    // typed zero (_t - _t below): coalescing with a double literal would
    // silently promote integral running sums to DoubleType and break
    // window-equivalence
    val wOff = Window.partitionBy(col(group)).orderBy(col("_slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totalAggs = values.indices.map(i => sum(col(s"_v$i")).as(s"_t$i"))
    val offsets = values.indices.foldLeft(
      sliced.groupBy(col("_slice"), col(group))
        .agg(totalAggs.head, totalAggs.tail: _*)) { (acc, i) =>
        acc.withColumn(s"_off$i",
          coalesce(sum(col(s"_t$i")).over(wOff), col(s"_t$i") - col(s"_t$i")))
      }
      .select(col("_slice") +: col(group) +:
        values.indices.map(i => col(s"_off$i")): _*)
    val out = values.zipWithIndex.foldLeft(
      local.join(broadcast(offsets), Seq("_slice", group))) {
      case (acc, ((_, as), i)) => acc.withColumn(as, col(s"_run$i") + col(s"_off$i"))
    }
    out.drop("_slice" +:
      values.indices.flatMap(i => Seq(s"_v$i", s"_run$i", s"_off$i")): _*)
  }

  /** Distributed running (prefix) MAX — the second instantiation of the
    * slice decomposition for an algebraic aggregate: equivalent to
    * `max(value).over(partitionBy(group).orderBy(orderCols).rowsBetween(
    * unboundedPreceding, currentRow))`. Local prefix maxima inside
    * bounded range slices; the per-slice total max rolls forward through
    * the k-row offsets relation and rejoins broadcast. The first slice
    * of each group has no predecessor — its offset is null and the
    * coalesce falls back to the local value, so no sentinel minimum is
    * ever invented (which would have to be type-dependent). Slice
    * boundaries are pinned internally like every other entry point —
    * no caller-side pre-materialization needed. */
  def runningMax(df: DataFrame, group: String, orderCols: Seq[Column],
      value: Column, as: String): DataFrame = {
    val keys = col(group) +: orderCols
    val sliced = pinSliced(df, keys).withColumn("_v", value)
    val vType = sliced.schema("_v").dataType
    val local =
      if (streamableSum(vType) && streamEnabled(df)) {
        val vIdx = sliced.schema.fieldIndex("_v")
        val intg = isIntegral(vType)
        // boxed through get(i, vType): a fresh box per read, safe to
        // retain across (possibly buffer-reused) input rows
        streamPass(sliced, group,
          Seq(StructField("_run", vType, nullable = true))) { () =>
          var seen = false
          var mL = Long.MinValue
          var mD = Double.NegativeInfinity
          var boxed: Any = null
          r => {
            if (!r.isNullAt(vIdx)) {
              if (intg) {
                val v = r.get(vIdx, vType).asInstanceOf[Number].longValue
                if (!seen || v > mL) { mL = v; boxed = r.get(vIdx, vType) }
              } else {
                val v = r.get(vIdx, vType).asInstanceOf[Number].doubleValue
                // NaN sorts above every double in Spark's ordering, and
                // max propagates it the same way: v >= anything fails for
                // NaN via >, so compare through Spark's semantics
                if (!seen || java.lang.Double.compare(v, mD) > 0) {
                  mD = v; boxed = r.get(vIdx, vType)
                }
              }
              seen = true
            }
            Seq(if (seen) boxed else null)
          }
        }
      } else {
        sliced.withColumn("_run", max(col("_v")).over(
          Window.partitionBy(col("_slice"), col(group)).orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      }
    val offsets = sliced.groupBy(col("_slice"), col(group))
      .agg(max(col("_v")).as("_t"))
      .withColumn("_off", max(col("_t")).over(
        Window.partitionBy(col(group)).orderBy(col("_slice"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_slice"), col(group), col("_off"))
    local.join(broadcast(offsets), Seq("_slice", group))
      .withColumn(as, greatest(col("_run"), coalesce(col("_off"), col("_run"))))
      .drop("_slice", "_v", "_run", "_off")
  }

  /** rowNumber and runningSum fused: one range shuffle, one slice-local
    * streaming pass evaluating both, one offsets aggregate carrying both
    * the row count and the value total per (slice, group). Use when a
    * caller needs the global row number AND a global prefix sum (q17):
    * two separate decomposition calls would range-shuffle the data
    * twice. */
  def rowNumberAndRunningSum(df: DataFrame, group: String,
      orderCols: Seq[Column], value: Column, rnAs: String,
      runAs: String): DataFrame = {
    val keys = col(group) +: orderCols
    val sliced = pinSliced(df, keys).withColumn("_v", value)
    val vType = sliced.schema("_v").dataType
    val local =
      if (streamableSum(vType) && streamEnabled(df)) {
        val vIdx = sliced.schema.fieldIndex("_v")
        val intg = isIntegral(vType)
        val getL = if (intg) longGetter(vType, vIdx) else null
        val getD = if (!intg) doubleGetter(vType, vIdx) else null
        streamPass(sliced, group,
          Seq(StructField("_lrn", IntegerType, nullable = false),
            StructField("_run", sumType(vType), nullable = true))) { () =>
          var rn = 0
          var seen = false
          var accL = 0L
          var accD = 0.0
          r => {
            rn += 1
            if (!r.isNullAt(vIdx)) {
              seen = true
              if (intg) accL += getL(r)
              else accD += getD(r)
            }
            Seq(rn,
              if (!seen) null
              else if (intg) java.lang.Long.valueOf(accL)
              else java.lang.Double.valueOf(accD))
          }
        }
      } else {
        val w = Window.partitionBy(col("_slice"), col(group))
          .orderBy(orderCols: _*)
        sliced
          .withColumn("_lrn", row_number().over(w))
          .withColumn("_run", sum(col("_v")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      }
    val wOff = Window.partitionBy(col(group)).orderBy(col("_slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col("_slice"), col(group))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_t"))
      .withColumn("_offn", sum(col("_n")).over(wOff))
      .withColumn("_offv", sum(col("_t")).over(wOff))
      .select(col("_slice"), col(group),
        coalesce(col("_offn"), lit(0L)).as("_offn"),
        // typed zero: see runningSum
        coalesce(col("_offv"), col("_t") - col("_t")).as("_offv"))
    local.join(broadcast(offsets), Seq("_slice", group))
      .withColumn(rnAs, (col("_lrn") + col("_offn")).cast("int"))
      .withColumn(runAs, col("_run") + col("_offv"))
      .drop("_slice", "_v", "_lrn", "_run", "_offn", "_offv")
  }

  def rowNumber(df: DataFrame, group: String, orderCols: Seq[Column],
      as: String): DataFrame = {
    val (local, sliceCounts) = rankedLocal(df, group, orderCols)
    local.join(broadcast(offsetsOf(sliceCounts, group)), Seq("_slice", group))
      .withColumn(as, (col("_lrn") + col("_off")).cast("int"))
      .drop("_slice", "_lrn", "_off")
  }
}
