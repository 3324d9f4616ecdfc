"""Bounded-state streaming TOPK / TOPK_DISTINCT / HISTOGRAM / COLLECT_*.

The native streaming lowering of these aggregates folds ``collect_list``
state per group — one state value that grows with the group's history, so a
hot key in a long-running EMIT CHANGES query grows one RocksDB value without
bound.  This module is the scale path: a custom stateful operator
(``applyInPandasWithState``, same template as streaming/sessions.py) whose
per-group state is *bounded by construction*:

  * TOPK(k):          state = the current top-k values (sorted desc, <= k).
    Exact: values are only ever added, so anything outside the running
    top-k can never re-enter it.
  * TOPK_DISTINCT(k): state = distinct top-k (<= k).  Exact, same argument.
  * COLLECT_LIST/SET: state = first ``limit`` values (ksqlDB semantics:
    ``ksql.functions.collect_list.limit`` caps entries and ignores the
    rest; reference aggregate_fn.go:96-140 surfaces the same UDAFs).
    Exact (== batch) whenever the group stays under the limit.
  * HISTOGRAM:        state = a SpaceSaving sketch (Metwally et al. 2005)
    of ``capacity`` (value, count, error) entries.  Counts are EXACT while
    the group's distinct-value count <= capacity (all errors 0 — the common
    case: HISTOGRAM is meant for low-cardinality values); beyond that it
    degrades to the classic top-frequent guarantee (count overestimated by
    at most min-count at eviction time, tracked in the error slot).

Emission contract (same as the built-in windowed changelog): every
micro-batch emits an upsert row per touched group; closed windows are
evicted by event-time timeout once the watermark passes window_end.  Group
identities never merge, so no tombstones are needed (unlike sessions).

Scale notes: one shuffle on (window, keys) — identical to the native agg;
state per group is O(k) / O(limit) / O(capacity) regardless of group size;
rows cross the Python boundary as Arrow batches (no per-row UDF).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..errors import AnalysisError
from ..expr import CollectList, CollectSet, Histogram, TopK, TopKDistinct, WindowSpec

DEFAULT_COLLECT_LIMIT = 1000  # ksqlDB: ksql.functions.collect_list.limit


# ---------------------------------------------------------------------------
# pure merge kernels (unit-testable; these ARE the state bound)
# ---------------------------------------------------------------------------


def _is_nan(v) -> bool:
    return isinstance(v, float) and v != v


def _sort_key(v):
    """Order key matching Spark's double ordering: NaN sorts greatest.

    Plain ``sorted`` is undefined with NaN (every comparison is False); the
    (is_nan, value) tuple makes all NaNs compare equal to each other and
    greater than every number — bit-matching the batch ``sort_array`` path.
    """
    return (_is_nan(v), v)


def merge_topk(cur: list, new_vals, k: int, distinct: bool) -> list:
    """Merge batch values into a top-k state list (sorted desc, len <= k).

    NaN handling matches the batch lowering: NaN is the greatest double and
    (for the distinct variant) all NaNs are one value — Spark's set
    semantics, not Python's object-identity NaN sets.
    """
    if distinct:
        vals = set()
        has_nan = False
        for v in list(cur) + list(new_vals):
            if _is_nan(v):
                has_nan = True
            else:
                vals.add(v)
        merged = list(vals) + ([float("nan")] if has_nan else [])
        return sorted(merged, key=_sort_key, reverse=True)[:k]
    merged = list(cur)
    merged.extend(new_vals)
    merged.sort(key=_sort_key, reverse=True)
    return merged[:k]


def merge_collect(cur: list, new_vals, limit: int, is_set: bool) -> list:
    """First-``limit`` collect (ksqlDB cap semantics; len <= limit).

    For the set variant NaN counts as a single value (Spark set semantics).
    """
    out = list(cur)
    if is_set:
        seen = {v for v in out if not _is_nan(v)}
        has_nan = any(_is_nan(v) for v in out)
        for v in new_vals:
            if len(out) >= limit:
                break
            if _is_nan(v):
                if not has_nan:
                    out.append(v)
                    has_nan = True
            elif v not in seen:
                out.append(v)
                seen.add(v)
    else:
        room = limit - len(out)
        if room > 0:
            out.extend(list(new_vals)[:room])
    return out


def merge_spacesaving(
    hkeys: list, hcnts: list, herrs: list, batch_counts: dict, capacity: int
) -> tuple[list, list, list]:
    """SpaceSaving merge: at most ``capacity`` (key, count, error) entries.

    While len <= capacity every error is 0 and counts are exact.  On
    eviction the incoming key inherits (min_count + its count) with
    error = min_count — the standard overestimate bound.  Batch keys are
    folded in sorted order so eviction is deterministic.
    """
    m = {k: [c, e] for k, c, e in zip(hkeys, hcnts, herrs)}
    for v in sorted(batch_counts):
        c = batch_counts[v]
        if v in m:
            m[v][0] += c
        elif len(m) < capacity:
            m[v] = [c, 0]
        else:
            evict = min(m.items(), key=lambda kv: (kv[1][0], kv[0]))
            floor = evict[1][0]
            del m[evict[0]]
            m[v] = [floor + c, floor]
    keys = sorted(m)
    return keys, [m[k][0] for k in keys], [m[k][1] for k in keys]


def hist_top_buckets(hkeys: list, hcnts: list, buckets: int) -> tuple[list, list]:
    """The HISTOGRAM output contract: ``buckets`` most frequent entries,
    ties broken by value — identical ordering to the batch lowering."""
    order = sorted(range(len(hkeys)), key=lambda i: (-hcnts[i], hkeys[i]))[:buckets]
    return [hkeys[i] for i in order], [hcnts[i] for i in order]


# ---------------------------------------------------------------------------
# the stateful operator
# ---------------------------------------------------------------------------


def _bounded_func(spec_kind: str, bound: int, buckets: int, n_keys: int, windowed: bool) -> Callable:
    import pandas as pd  # noqa: PLC0415 — executor-side import

    is_hist = spec_kind == "histogram"

    def emit(key, out_vals) -> "pd.DataFrame":
        data = {}
        i = 0
        if windowed:
            data["window_start"] = [key[0]]
            data["window_end"] = [key[1]]
            i = 2
        for j in range(n_keys):
            data[f"__k{j}"] = [key[i + j]]
        if is_hist:
            bk, bc = out_vals
            data["__hk"] = pd.Series([list(bk)], dtype=object)
            data["__hc"] = pd.Series([list(bc)], dtype=object)
        else:
            # float NaN cannot cross the Arrow output boundary as a VALUE
            # (from_pandas converts it to null, and Spark's columnar reader
            # for this operator's output throws on null array elements under
            # any element-level expression).  Ship the non-NaN elements plus
            # a NaN count; the JVM side rebuilds the array with array_repeat
            # + concat, which never reads a null element.
            vals_list = list(out_vals)
            nan_ct = sum(1 for v in vals_list if _is_nan(v))
            data["__out"] = pd.Series(
                [[v for v in vals_list if not _is_nan(v)]], dtype=object
            )
            data["__nan"] = [nan_ct]
        return pd.DataFrame(data)

    def empty() -> "pd.DataFrame":
        cols = (["window_start", "window_end"] if windowed else []) + [
            f"__k{j}" for j in range(n_keys)
        ]
        cols += ["__hk", "__hc"] if is_hist else ["__out", "__nan"]
        return pd.DataFrame({c: [] for c in cols})

    def func(key, pdf_iter: Iterator, state: GroupState) -> Iterator:
        if state.hasTimedOut:
            # watermark passed window_end: the final upsert is already in the
            # changelog; just release the state
            state.remove()
            yield empty()
            return

        if is_hist:
            hkeys, hcnts, herrs = state.get if state.exists else ([], [], [])
        else:
            (vals,) = state.get if state.exists else ([],)
            # the Arrow/pandas state round-trip stores float NaN as null
            # (from_pandas semantics); inputs are null-filtered JVM-side, so
            # any None here IS a NaN — restore it
            vals = [float("nan") if v is None else v for v in vals]

        touched = False
        for pdf in pdf_iter:
            # NULLs are filtered JVM-side before the operator, so any float
            # NaN here is a genuine NaN value — keep it (dropna would drop
            # it, silently diverging from the batch lowering, which orders
            # NaN greatest)
            col = pdf["__a0"]
            if col.empty:
                continue
            touched = True
            batch = col.tolist()
            if spec_kind == "topk":
                vals = merge_topk(vals, batch, bound, distinct=False)
            elif spec_kind == "topk_distinct":
                vals = merge_topk(vals, batch, bound, distinct=True)
            elif spec_kind in ("collect_list", "collect_set"):
                vals = merge_collect(vals, batch, bound, is_set=spec_kind == "collect_set")
            else:
                counts: dict = {}
                for v in batch:
                    s = str(v)
                    counts[s] = counts.get(s, 0) + 1
                hkeys, hcnts, herrs = merge_spacesaving(hkeys, hcnts, herrs, counts, bound)

        if not touched:
            # invoked but every row dropped (NULL inputs): Spark clears the
            # old timeout on each invocation, so re-arm it or the window's
            # state is never evicted
            if windowed and state.exists:
                wm_ms = state.getCurrentWatermarkMs()
                we_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
                state.setTimeoutTimestamp(max(we_ms, wm_ms + 1))
            yield empty()
            return

        if is_hist:
            state.update((hkeys, hcnts, herrs))
        else:
            state.update((vals,))
        if windowed:
            wm_ms = state.getCurrentWatermarkMs()
            # group keys arrive as NAIVE datetimes (session runs in UTC);
            # datetime.timestamp() would re-interpret them in host-local
            # time — pd.Timestamp.value is the naive-as-UTC epoch
            we_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
            state.setTimeoutTimestamp(max(we_ms, wm_ms + 1))

        if is_hist:
            yield emit(key, hist_top_buckets(hkeys, hcnts, buckets))
        else:
            out = (
                sorted(vals, key=_sort_key)
                if spec_kind in ("collect_list", "collect_set")
                else vals
            )
            yield emit(key, out)

    return func


def bounded_agg_changelog(
    df: DataFrame,
    ts_col: str | None,
    keys: list[tuple[str, Column]],
    window: WindowSpec | None,
    agg,
    collect_limit: int = DEFAULT_COLLECT_LIMIT,
    hist_capacity: int | None = None,
) -> DataFrame:
    """Compile one bounded-state aggregate over a stream under EMIT CHANGES.

    ``keys`` are (output_name, expression) pairs; ``window`` is a tumbling or
    hopping spec (or None for a plain grouped table); ``agg`` is the single
    TopK / TopKDistinct / Histogram / CollectList / CollectSet field.
    Upstream must already carry the event-time watermark (compile_select
    applies it before any stateful op).

    Output: [window_start, window_end,] <keys...>, <agg output> — the same
    shape as the native windowed changelog.
    """
    if isinstance(agg, TopKDistinct):
        kind, bound = "topk_distinct", agg.k
    elif isinstance(agg, TopK):
        kind, bound = "topk", agg.k
    elif isinstance(agg, Histogram):
        kind, bound = "histogram", hist_capacity or max(agg.buckets * 5, 100)
    elif isinstance(agg, CollectSet):
        kind, bound = "collect_set", collect_limit
    elif isinstance(agg, CollectList):
        if getattr(agg, "order_by", None):
            raise AnalysisError(
                "COLLECT_LIST with an explicit order key is not supported in the "
                "bounded streaming path; use EMIT FINAL or a pull query"
            )
        kind, bound = "collect_list", collect_limit
    else:  # pragma: no cover — guarded by the compile-time dispatch
        raise AnalysisError(f"unsupported bounded aggregate {type(agg).__name__}")

    windowed = window is not None
    if windowed and ts_col is None:
        raise AnalysisError("windowed aggregation requires an event-time column")

    # narrow pre-shuffle projection; for hopping windows F.window expands one
    # event into size/advance rows (same as the native lowering)
    cols: list[Column] = []
    if windowed:
        # keep the watermark-tagged event-time column in the projection —
        # EventTimeTimeout requires a watermarked column in the stateful
        # operator's child (the tag does not survive `__w.start` extraction)
        cols.append(F.col(ts_col).alias("__ts"))
        cols.append(window.grouping_column(ts_col).alias("__w"))
    if not keys and not windowed:
        keys = [("__g", F.lit(0))]
        drop_dummy = True
    else:
        drop_dummy = False
    cols += [c.alias(f"__k{i}") for i, (_, c) in enumerate(keys)]
    # HISTOGRAM keys must match the batch lowering bit-for-bit: Spark's
    # cast-to-string (booleans 'true'/'false', Spark float formatting), not
    # Python str() — so cast JVM-side before the Arrow boundary
    agg_in = agg.arg.to_column()
    if isinstance(agg, Histogram):
        agg_in = agg_in.cast("string")
    cols.append(agg_in.alias("__a0"))
    # aggregates skip NULL inputs; filtering them JVM-side also keeps the
    # Arrow->pandas transfer on exact dtypes (a nullable int64 batch would
    # otherwise arrive as float64 and corrupt ids above 2^53)
    proj = df.select(*cols).filter(F.col("__a0").isNotNull())
    if windowed:
        proj = proj.select(
            F.col("__ts"),
            F.col("__w.start").alias("__ws"),
            F.col("__w.end").alias("__we"),
            *proj.columns[2:],
        )

    val_type = proj.schema["__a0"].dataType
    key_names = [f"__k{i}" for i in range(len(keys))]
    group_cols = (["__ws", "__we"] if windowed else []) + key_names

    win_fields = (
        [StructField("window_start", TimestampType()), StructField("window_end", TimestampType())]
        if windowed
        else []
    )
    key_fields = [StructField(n, proj.schema[n].dataType) for n in key_names]
    if kind == "histogram":
        out_fields = [
            StructField("__hk", ArrayType(StringType())),
            StructField("__hc", ArrayType(LongType())),
        ]
        state_schema = StructType(
            [
                StructField("hkeys", ArrayType(StringType())),
                StructField("hcnts", ArrayType(LongType())),
                StructField("herrs", ArrayType(LongType())),
            ]
        )
    else:
        out_fields = [
            StructField("__out", ArrayType(val_type)),
            StructField("__nan", LongType()),
        ]
        state_schema = StructType([StructField("vals", ArrayType(val_type))])
    out_schema = StructType(win_fields + key_fields + out_fields)

    func = _bounded_func(
        kind, bound, getattr(agg, "buckets", 0), len(keys), windowed
    )
    timeout = (
        GroupStateTimeout.EventTimeTimeout if windowed else GroupStateTimeout.NoTimeout
    )
    out = proj.groupBy(*[F.col(c) for c in group_cols]).applyInPandasWithState(
        func, out_schema, state_schema, "update", timeout
    )

    sel: list[Column] = []
    if windowed:
        sel += [F.col("window_start"), F.col("window_end")]
    sel += [
        F.col(n).alias(keys[i][0])
        for i, n in enumerate(key_names)
        if not (drop_dummy and keys[i][0] == "__g")
    ]
    if kind == "histogram":
        sel.append(
            F.map_from_arrays(F.col("__hk"), F.col("__hc")).alias(agg.output_name())
        )
    elif val_type.typeName() in ("double", "float"):
        # rebuild the NaN elements shipped as a count (see emit()): NaN is
        # the greatest double, so it leads a desc top-k and trails an asc
        # collect — matching the batch lowering's sort exactly
        nan_arr = F.array_repeat(
            F.lit(float("nan")).cast(val_type), F.col("__nan").cast("int")
        )
        rebuilt = (
            F.concat(nan_arr, F.col("__out"))
            if kind in ("topk", "topk_distinct")
            else F.concat(F.col("__out"), nan_arr)
        )
        sel.append(rebuilt.alias(agg.output_name()))
    else:
        sel.append(F.col("__out").alias(agg.output_name()))
    return out.select(*sel)
