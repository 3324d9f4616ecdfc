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


def _merge_scalar(kind: str, cur_val, cur_n: int, batch_vals: list, is_float: bool = True):
    """O(1)-state scalar merges (count/sum/min/max/avg-sum).

    ``batch_vals`` holds the batch's NON-NULL inputs (per-agg mask applied);
    NaN ordering for min/max matches Spark (NaN is the greatest double).
    Integral SUM **and AVG** accumulate the exact int sum (ADVICE r4: a
    double AVG accumulator diverges from Spark's exact long-sum average
    above 2^53) and raise on int64 overflow — the same failure the native
    ANSI-mode (Spark 4 default) long sum produces, but with a clear message
    instead of an Arrow state-store type error.
    """
    n = cur_n + len(batch_vals)
    if kind == "count":
        return None, n
    if kind in ("sum", "avg"):
        s = cur_val
        for v in batch_vals:
            v = float(v) if is_float else int(v)
            s = v if s is None else s + v
        if not is_float and s is not None and not (-(1 << 63) <= s < (1 << 63)):
            raise ArithmeticError(
                f"[ARITHMETIC_OVERFLOW] long overflow in streaming {kind.upper()} "
                f"state (ANSI mode matches the native lowering); cast the input "
                f"to DOUBLE or aggregate a narrower window"
            )
        return s, n
    # min / max
    vals = list(batch_vals)
    if cur_n:
        vals.append(cur_val)
    if not vals:
        return cur_val, n
    if kind == "max":
        return max(vals, key=_sort_key), n
    return min(vals, key=_sort_key), n


COLLECTION_KINDS = ("topk", "topk_distinct", "collect_list", "collect_set")
SCALAR_KINDS = ("count", "sum", "min", "max", "avg")


def _bounded_func(specs: list[dict], n_keys: int, windowed: bool) -> Callable:
    """The multi-aggregate stateful kernel: one state slot group per agg.

    ``specs`` is a list of plain dicts {kind, bound, buckets} — picklable,
    shipped to executors.  State layout is the concatenation of each agg's
    slots (collection: 1 array; histogram: 3 arrays; count: 1 long;
    sum/min/max/avg: value + contribution count).
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def emit(key, outs: list) -> "pd.DataFrame":
        data = {}
        i = 0
        if windowed:
            data["window_start"] = [key[0]]
            data["window_end"] = [key[1]]
            i = 2
        for j in range(n_keys):
            data[f"__k{j}"] = [key[i + j]]
        for ai, (spec, out) in enumerate(zip(specs, outs)):
            kind = spec["kind"]
            if kind == "histogram":
                bk, bc = out
                data[f"__hk{ai}"] = pd.Series([list(bk)], dtype=object)
                data[f"__hc{ai}"] = pd.Series([list(bc)], dtype=object)
            elif kind in COLLECTION_KINDS:
                # float NaN cannot cross the Arrow output boundary as a
                # VALUE (from_pandas converts it to null, and Spark's
                # columnar reader for this operator's output throws on null
                # array elements under any element-level expression).  Ship
                # the non-NaN elements plus a NaN count; the JVM side
                # rebuilds the array with array_repeat + concat.
                vals_list = list(out)
                nan_ct = sum(1 for v in vals_list if _is_nan(v))
                data[f"__out{ai}"] = pd.Series(
                    [[v for v in vals_list if not _is_nan(v)]], dtype=object
                )
                data[f"__nan{ai}"] = [nan_ct]
            elif kind == "count":
                data[f"__v{ai}"] = [out[1]]
            else:  # sum / min / max / avg: value (None when NaN/absent) + n
                v, n = out
                data[f"__v{ai}"] = pd.Series(
                    [None if (v is None or _is_nan(v)) else v], dtype=object
                )
                data[f"__n{ai}"] = [n]
        return pd.DataFrame(data)

    def load_state(state: GroupState) -> list:
        flat = state.get if state.exists else None
        slots = []
        pos = 0
        for spec in specs:
            kind = spec["kind"]
            if kind == "histogram":
                slots.append(
                    (list(flat[pos]), list(flat[pos + 1]), list(flat[pos + 2]))
                    if flat
                    else ([], [], [])
                )
                pos += 3
            elif kind in COLLECTION_KINDS:
                vals = list(flat[pos]) if flat else []
                # Arrow/pandas state round-trip stores float NaN as null;
                # inputs are masked non-null, so any None IS a NaN
                slots.append([float("nan") if v is None else v for v in vals])
                pos += 1
            elif kind == "count":
                slots.append((None, flat[pos] if flat else 0))
                pos += 1
            else:
                if flat:
                    v, n = flat[pos], flat[pos + 1]
                    if v is None and n and spec.get("is_float"):
                        v = float("nan")
                    slots.append((v, n))
                else:
                    slots.append((None, 0))
                pos += 2
        return slots

    def store_state(state: GroupState, slots: list) -> None:
        flat: list = []
        for spec, slot in zip(specs, slots):
            kind = spec["kind"]
            if kind == "histogram":
                flat += [slot[0], slot[1], slot[2]]
            elif kind in COLLECTION_KINDS:
                flat.append(slot)
            elif kind == "count":
                flat.append(slot[1])
            else:
                v = slot[0]
                flat += [None if (v is not None and _is_nan(v)) else v, slot[1]]
        state.update(tuple(flat))

    def func(key, pdf_iter: Iterator, state: GroupState) -> Iterator:
        if state.hasTimedOut:
            # watermark passed window_end: the final upsert is already in the
            # changelog; just release the state (yield nothing — an empty
            # frame per evicted key per batch is pure overhead, r7)
            state.remove()
            return

        slots = load_state(state)
        touched = False
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            touched = True
            for ai, spec in enumerate(specs):
                kind = spec["kind"]
                col = pdf[f"__a{ai}"][~pdf[f"__m{ai}"]]
                if col.empty:
                    continue
                batch = col.tolist()
                if kind == "topk":
                    slots[ai] = merge_topk(slots[ai], batch, spec["bound"], distinct=False)
                elif kind == "topk_distinct":
                    slots[ai] = merge_topk(slots[ai], batch, spec["bound"], distinct=True)
                elif kind in ("collect_list", "collect_set"):
                    slots[ai] = merge_collect(
                        slots[ai], batch, spec["bound"], is_set=kind == "collect_set"
                    )
                elif kind == "histogram":
                    counts: dict = {}
                    for v in batch:
                        sv = str(v)
                        counts[sv] = counts.get(sv, 0) + 1
                    slots[ai] = merge_spacesaving(*slots[ai], counts, spec["bound"])
                else:
                    slots[ai] = _merge_scalar(
                        kind, slots[ai][0], slots[ai][1], batch, spec.get("is_float", True)
                    )

        if not touched:
            # invoked but no rows (shouldn't happen given the JVM-side
            # any-input-non-null filter): Spark clears the old timeout on
            # each invocation, so re-arm it or the window's state leaks
            if windowed and state.exists:
                wm_ms = state.getCurrentWatermarkMs()
                we_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
                state.setTimeoutTimestamp(max(we_ms, wm_ms + 1))
            return  # nothing to emit — and no empty frame to build (r7)

        store_state(state, slots)
        if windowed:
            wm_ms = state.getCurrentWatermarkMs()
            # group keys arrive as NAIVE datetimes (session runs in UTC);
            # datetime.timestamp() would re-interpret them in host-local
            # time — pd.Timestamp.value is the naive-as-UTC epoch
            we_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
            state.setTimeoutTimestamp(max(we_ms, wm_ms + 1))

        outs = []
        for spec, slot in zip(specs, slots):
            kind = spec["kind"]
            if kind == "histogram":
                outs.append(hist_top_buckets(slot[0], slot[1], spec["buckets"]))
            elif kind in ("collect_list", "collect_set"):
                outs.append(sorted(slot, key=_sort_key))
            elif kind in COLLECTION_KINDS:
                outs.append(slot)
            else:
                outs.append(slot)
        yield emit(key, outs)

    return func


def _spec_of(agg, collect_limit: int, hist_capacity: int | None) -> dict:
    from ..expr import Avg, Count, Max, Min, Sum

    if isinstance(agg, TopKDistinct):
        return {"kind": "topk_distinct", "bound": agg.k, "buckets": 0}
    if isinstance(agg, TopK):
        return {"kind": "topk", "bound": agg.k, "buckets": 0}
    if isinstance(agg, Histogram):
        return {
            "kind": "histogram",
            "bound": hist_capacity or max(agg.buckets * 5, 100),
            "buckets": agg.buckets,
        }
    if isinstance(agg, CollectSet):
        return {"kind": "collect_set", "bound": collect_limit, "buckets": 0}
    if isinstance(agg, CollectList):
        if getattr(agg, "order_by", None):
            raise AnalysisError(
                "COLLECT_LIST with an explicit order key is not supported in the "
                "bounded streaming path; use EMIT FINAL or a pull query"
            )
        return {"kind": "collect_list", "bound": collect_limit, "buckets": 0}
    if isinstance(agg, Count):
        return {"kind": "count", "bound": 0, "buckets": 0}
    if isinstance(agg, Sum):
        return {"kind": "sum", "bound": 0, "buckets": 0}
    if isinstance(agg, Min):
        return {"kind": "min", "bound": 0, "buckets": 0}
    if isinstance(agg, Max):
        return {"kind": "max", "bound": 0, "buckets": 0}
    if isinstance(agg, Avg):
        return {"kind": "avg", "bound": 0, "buckets": 0}
    raise AnalysisError(f"unsupported bounded aggregate {type(agg).__name__}")


def _null_default(dtype) -> Column:
    """A type-true non-null placeholder for masked (NULL) inputs — never
    aggregated (the mask excludes it), only there to keep Arrow dtypes
    exact.  DATE/TIMESTAMP/BINARY need literal defaults: ANSI mode rejects
    the numeric cast for them."""
    import datetime

    name = dtype.typeName()
    if name == "string":
        return F.lit("")
    if name == "boolean":
        return F.lit(False)
    if name == "date":
        return F.lit(datetime.date(1970, 1, 1))
    if name in ("timestamp", "timestamp_ntz"):
        return F.lit(datetime.datetime(1970, 1, 1)).cast(dtype)
    if name == "binary":
        return F.lit(b"")
    return F.lit(0).cast(dtype)


def bounded_agg_changelog(
    df: DataFrame,
    ts_col: str | None,
    keys: list[tuple[str, Column]],
    window: WindowSpec | None,
    aggs,
    collect_limit: int = DEFAULT_COLLECT_LIMIT,
    hist_capacity: int | None = None,
) -> DataFrame:
    """Compile the bounded-state aggregates over a stream under EMIT CHANGES.

    ``keys`` are (output_name, expression) pairs; ``window`` is a tumbling or
    hopping spec (or None for a plain grouped table); ``aggs`` is the list of
    aggregate fields — any mix of the bounded collection aggregates
    (TOPK / TOPK_DISTINCT / HISTOGRAM / COLLECT_*) and the O(1)-state
    scalars (COUNT / SUM / MIN / MAX / AVG), all folded in ONE stateful
    operator so a mixed query never falls back to the unbounded native
    collect fold.  Upstream must already carry the event-time watermark
    (compile_select applies it before any stateful op).

    Output: [window_start, window_end,] <keys...>, <agg outputs...> — the
    same shape as the native windowed changelog.
    """
    from pyspark.sql.types import DoubleType

    if not isinstance(aggs, (list, tuple)):
        aggs = [aggs]
    aggs = list(aggs)
    specs = [_spec_of(a, collect_limit, hist_capacity) for a in aggs]

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

    # per-agg input + null mask.  Aggregates skip NULL inputs, but with
    # multiple aggs a row may be null for one input and not another, so the
    # old row-level isNotNull filter becomes a per-agg MASK; the value
    # column is coalesced to a type-true default so the Arrow->pandas
    # transfer keeps exact dtypes (a nullable int64 batch would otherwise
    # arrive as float64 and corrupt ids above 2^53).  HISTOGRAM keys must
    # match the batch lowering bit-for-bit: Spark's cast-to-string, not
    # Python str(), so the cast happens JVM-side.
    raw_inputs: list[Column] = []
    for i, agg in enumerate(aggs):
        agg_in = agg.arg.to_column()
        if isinstance(agg, Histogram):
            agg_in = agg_in.cast("string")
        raw_inputs.append(agg_in)
        cols.append(agg_in.isNull().alias(f"__m{i}"))
        cols.append(F.coalesce(agg_in, _null_default(df.select(agg_in.alias("x")).schema["x"].dataType)).alias(f"__a{i}"))

    if not aggs:
        raise AnalysisError("bounded_agg_changelog requires at least one aggregate")
    keep = raw_inputs[0].isNotNull()
    for c in raw_inputs[1:]:
        keep = keep | c.isNotNull()
    proj = df.select(*cols).filter(keep)
    if windowed:
        proj = proj.select(
            F.col("__ts"),
            F.col("__w.start").alias("__ws"),
            F.col("__w.end").alias("__we"),
            *proj.columns[2:],
        )

    val_types = [proj.schema[f"__a{i}"].dataType for i in range(len(aggs))]
    for spec, vt in zip(specs, val_types):
        spec["is_float"] = vt.typeName() in ("double", "float")
    key_names = [f"__k{i}" for i in range(len(keys))]
    group_cols = (["__ws", "__we"] if windowed else []) + key_names

    win_fields = (
        [StructField("window_start", TimestampType()), StructField("window_end", TimestampType())]
        if windowed
        else []
    )
    key_fields = [StructField(n, proj.schema[n].dataType) for n in key_names]
    out_fields: list[StructField] = []
    state_fields: list[StructField] = []
    for i, (spec, vt) in enumerate(zip(specs, val_types)):
        kind = spec["kind"]
        if kind == "histogram":
            out_fields += [
                StructField(f"__hk{i}", ArrayType(StringType())),
                StructField(f"__hc{i}", ArrayType(LongType())),
            ]
            state_fields += [
                StructField(f"hk{i}", ArrayType(StringType())),
                StructField(f"hc{i}", ArrayType(LongType())),
                StructField(f"he{i}", ArrayType(LongType())),
            ]
        elif kind in COLLECTION_KINDS:
            out_fields += [
                StructField(f"__out{i}", ArrayType(vt)),
                StructField(f"__nan{i}", LongType()),
            ]
            state_fields += [StructField(f"vals{i}", ArrayType(vt))]
        elif kind == "count":
            out_fields += [StructField(f"__v{i}", LongType())]
            state_fields += [StructField(f"n{i}", LongType())]
        else:
            # SUM widens integrals to long (Spark sum semantics); AVG over
            # integrals keeps the EXACT long sum in state and casts to
            # double only at the final division — one rounding, matching
            # the native Average(Long) bit-for-bit above 2^53 (ADVICE r4)
            if kind in ("sum", "avg"):
                st = DoubleType() if spec["is_float"] else LongType()
            else:
                st = vt
            out_fields += [
                StructField(f"__v{i}", st),
                StructField(f"__n{i}", LongType()),
            ]
            state_fields += [
                StructField(f"v{i}", st),
                StructField(f"n{i}", LongType()),
            ]
    out_schema = StructType(win_fields + key_fields + out_fields)
    state_schema = StructType(state_fields)

    func = _bounded_func(specs, len(keys), windowed)
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
    for i, (agg, spec, vt) in enumerate(zip(aggs, specs, val_types)):
        kind = spec["kind"]
        name = agg.output_name()
        if kind == "histogram":
            sel.append(F.map_from_arrays(F.col(f"__hk{i}"), F.col(f"__hc{i}")).alias(name))
        elif kind in COLLECTION_KINDS:
            if spec["is_float"]:
                # rebuild the NaN elements shipped as a count (see emit()):
                # NaN is the greatest double, so it leads a desc top-k and
                # trails an asc collect — matching the batch sort exactly
                nan_arr = F.array_repeat(
                    F.lit(float("nan")).cast(vt), F.col(f"__nan{i}").cast("int")
                )
                rebuilt = (
                    F.concat(nan_arr, F.col(f"__out{i}"))
                    if kind in ("topk", "topk_distinct")
                    else F.concat(F.col(f"__out{i}"), nan_arr)
                )
                sel.append(rebuilt.alias(name))
            else:
                sel.append(F.col(f"__out{i}").alias(name))
        elif kind == "count":
            sel.append(F.col(f"__v{i}").alias(name))
        elif kind == "avg":
            base = F.col(f"__v{i}")
            if spec["is_float"]:
                # float NaN crossed the boundary as null; n>0 means it IS NaN
                base = F.coalesce(base, F.lit(float("nan")))
            sel.append(
                F.when(F.col(f"__n{i}") > 0, base.cast("double") / F.col(f"__n{i}"))
                .otherwise(F.lit(None).cast("double"))
                .alias(name)
            )
        else:  # sum / min / max: NULL when no contributions, NaN restored
            # a float NaN scalar crossed the boundary as null (from_pandas);
            # with n>0 contributions the value can only be null if it IS NaN
            res_type = (
                (DoubleType() if spec["is_float"] else LongType())
                if kind == "sum"
                else vt
            )
            base = F.col(f"__v{i}")
            if spec["is_float"]:
                base = F.coalesce(base, F.lit(float("nan")).cast(res_type))
            sel.append(
                F.when(F.col(f"__n{i}") > 0, base)
                .otherwise(F.lit(None).cast(res_type))
                .alias(name)
            )
    return out.select(*sel)
