"""Lookup (fetch) strategies: exact, ordered first-match regex, union-regex
substitution — the three modes of the reference
(/root/reference/lib/logstash/filters/fetch_strategy/memory.rb:4-49).

Spark-first design
------------------
Every strategy exposes the same *expression-plane* contract: a Column
function producing ``struct<matched boolean, value V, key string,
error string>`` for a scalar key, and an array variant for ``iterate_on``.
The exact strategy additionally offers a *join-plane* broadcast hash join
(BroadcastHashJoinExec, whole-stage codegen, no Python) — the default at
scale; the map-literal expression is used for small dictionaries where a
plan-embedded literal beats shipping a join.

Regex / union semantics genuinely need per-row regex engines, so they are
Arrow-vectorized pandas UDFs holding the (pattern, value) table compiled
once per executor (the reference precompiles per reload —
fetch_strategy/file.rb:34-40; our analogue is compile-on-first-batch in the
UDF closure because compiled patterns don't pickle).
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

Pairs = Sequence[Tuple[str, Any]]

#: above this many entries the exact strategy switches from a plan-embedded
#: map literal to a broadcast hash join (join plane)
MAP_LITERAL_MAX_ENTRIES = 512
# NOTE (code-review r7): build_strategy always selects the Arrow-UDF
# regex planes; the codegen-only RegexFirstMatch.when_chain_expr plane is
# reachable only by direct call (tests exercise it) and exists as the
# zero-Python option for tiny pattern sets — there is deliberately NO
# threshold constant wired into strategy selection (a stale one used to
# sit here implying otherwise).


def ruby_to_s(value: Any) -> str:
    """Ruby-ish ``to_s`` for dictionary values/keys (bool -> true/false,
    None -> "")."""
    if value is None:
        return ""
    if value is True:
        return "true"
    if value is False:
        return "false"
    return str(value)


def _scalar_kind(v: Any) -> str:
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    return "nested"


_SCALAR_TYPES = {
    "str": T.StringType(),
    "bool": T.BooleanType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
}


def _uniform_list_type(pairs: Pairs) -> Optional[T.DataType]:
    """ArrayType(elem) when every non-None value is a list whose non-None
    elements share one scalar kind (int+float widens to double); else None."""
    elem_kinds = set()
    for _, v in pairs:
        if v is None:
            continue
        if not isinstance(v, (list, tuple)):
            return None
        for e in v:
            if e is None:
                continue
            k = _scalar_kind(e)
            if k == "nested":
                return None
            elem_kinds.add(k)
    if not elem_kinds or elem_kinds == {"str"}:
        return T.ArrayType(T.StringType())
    if len(elem_kinds) == 1:
        return T.ArrayType(_SCALAR_TYPES[next(iter(elem_kinds))])
    if elem_kinds <= {"int", "float"}:
        return T.ArrayType(T.DoubleType())
    return None


def infer_value_type(
    pairs: Pairs, nested: str = "json"
) -> Tuple[T.DataType, Callable[[Any], Any], bool]:
    """Infer a single Spark type for the dictionary's value column.

    Returns (spark_type, python_converter, values_are_json).
    Homogeneous scalar types map directly (CSV stays string, JSON ints stay
    long — translate_spec.rb:359-379). Non-uniform or nested values:

      nested="json"  → carried as JSON strings (legacy deviation);
      nested="typed" → type-faithful: uniform lists become a real
        ``array<elem>`` column, anything else becomes a VARIANT column
        (Spark 4's schemaless value type — ``translation.e[1]`` style access
        works via variant_get, matching the reference's type fidelity for
        nested dictionary values, translate_spec.rb:237-240). The converter
        still yields JSON text for variants; the strategies wrap it in
        ``parse_json`` at plan time.
    """
    kinds = {
        _scalar_kind(v) for _, v in pairs if v is not None
    }
    if not kinds or kinds == {"str"}:
        return T.StringType(), lambda v: v, False
    if kinds == {"bool"}:
        return T.BooleanType(), lambda v: v, False
    if kinds == {"int"}:
        return T.LongType(), lambda v: v, False
    if kinds <= {"int", "float"}:
        return T.DoubleType(), lambda v: float(v) if v is not None else None, False
    if nested == "typed":
        arr = _uniform_list_type(pairs)
        if arr is not None:
            if isinstance(arr.elementType, T.DoubleType):
                # mixed int/float lists widen to array<double>; Python ints
                # must be coerced or createDataFrame's schema verification
                # rejects them at plan time (round-2 advice)
                return (
                    arr,
                    lambda v: (
                        [None if e is None else float(e) for e in v]
                        if v is not None
                        else None
                    ),
                    False,
                )
            return arr, lambda v: list(v) if v is not None else None, False
        return (
            T.VariantType(),
            lambda v: json.dumps(v, ensure_ascii=False) if v is not None else None,
            False,
        )
    return (
        T.StringType(),
        lambda v: json.dumps(v, ensure_ascii=False) if v is not None else None,
        True,
    )


def lookup_result_type(value_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("matched", T.BooleanType()),
            T.StructField("value", value_type),
            T.StructField("key", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )


class LookupStrategy:
    """Base contract. ``value_type``/``values_are_json`` describe the value
    column; ``expr``/``expr_array`` are the expression plane."""

    value_type: T.DataType
    values_are_json: bool
    mode: str

    def expr(self, key: Column) -> Column:
        raise NotImplementedError

    def expr_array(self, arr: Column) -> Column:
        raise NotImplementedError

    #: strategies backed by a broadcast join instead of an expression
    expression_capable: bool = True


# ---------------------------------------------------------------------------
# O1 — exact match
# ---------------------------------------------------------------------------

class ExactMapLiteral(LookupStrategy):
    """Exact hash probe as a plan-embedded ``map`` literal — Catalyst
    evaluates ``element_at`` / ``map_contains_key`` in codegen; zero Python.
    (fetch_strategy/memory.rb:4-16)."""

    mode = "exact"
    expression_capable = True

    def __init__(self, pairs: Pairs, nested: str = "json"):
        self.value_type, conv, self.values_are_json = infer_value_type(
            pairs, nested
        )
        is_variant = isinstance(self.value_type, T.VariantType)
        entries: List[Column] = []
        # last occurrence wins, like Hash#[]= on duplicate keys
        dedup = {str(k): conv(v) for k, v in pairs}
        for k, v in dedup.items():
            entries.append(F.lit(k))
            if v is None:
                entries.append(F.lit(None).cast(self.value_type))
            elif is_variant:
                # the converter yields JSON text; materialize a real
                # VARIANT literal so nested access (variant_get) works
                entries.append(F.parse_json(F.lit(v)))
            else:
                entries.append(F.lit(v).cast(self.value_type))
        self._empty = not entries
        self._map = F.create_map(*entries) if entries else None
        #: when no value is NULL, `element_at IS NOT NULL` ⇔ matched — one
        #: map probe instead of two (the scalar fast path uses this)
        self.has_null_values = any(v is None for v in dedup.values())

    def _probe(self, key: Column) -> Tuple[Column, Column]:
        if self._empty:
            return F.lit(False), F.lit(None).cast(self.value_type)
        matched = F.when(
            key.isNotNull(), F.map_contains_key(self._map, key)
        ).otherwise(F.lit(False))
        return matched, F.element_at(self._map, F.coalesce(key, F.lit("")))

    def expr(self, key: Column) -> Column:
        matched, value = self._probe(key)
        return F.struct(
            matched.alias("matched"),
            F.when(matched, value).alias("value"),
            F.when(matched, key).alias("key"),
            F.lit(None).cast("string").alias("error"),
        )

    def expr_array(self, arr: Column) -> Column:
        return F.transform(arr, lambda x: self.expr(x.cast("string")))


class ExactBroadcastJoin(LookupStrategy):
    """Exact probe as a broadcast hash join — the at-scale plane.

    The dictionary becomes a 2-column DataFrame broadcast to every executor
    (BroadcastHashJoinExec; no shuffle of the probe side, no skew exposure —
    hot keys cost nothing extra because the build side is replicated).
    """

    mode = "exact"
    expression_capable = False

    def __init__(self, spark, pairs: Pairs, nested: str = "json"):
        self.value_type, conv, self.values_are_json = infer_value_type(
            pairs, nested
        )
        dedup = {str(k): conv(v) for k, v in pairs}
        is_variant = isinstance(self.value_type, T.VariantType)
        schema = T.StructType(
            [
                T.StructField("__lfts_k", T.StringType(), False),
                T.StructField(
                    "__lfts_v",
                    T.StringType() if is_variant else self.value_type,
                    True,
                ),
            ]
        )
        self.dict_df = spark.createDataFrame(
            [(k, v) for k, v in dedup.items()], schema=schema
        )
        if is_variant:
            # ship JSON text, parse to VARIANT plan-side (VariantVal rows
            # aren't constructible from Python)
            self.dict_df = self.dict_df.select(
                "__lfts_k", F.parse_json("__lfts_v").alias("__lfts_v")
            )

    def join(self, df: DataFrame, key: Column, result_col: str) -> DataFrame:
        """Left-outer broadcast join; appends ``result_col`` with the uniform
        lookup struct. Misses survive for the fallback path (O8)."""
        probe = df.withColumn("__lfts_key", key)
        joined = probe.join(
            F.broadcast(self.dict_df),
            probe["__lfts_key"].eqNullSafe(self.dict_df["__lfts_k"]),
            "left",
        )
        matched = joined["__lfts_k"].isNotNull()
        return joined.withColumn(
            result_col,
            F.struct(
                matched.alias("matched"),
                F.when(matched, joined["__lfts_v"]).alias("value"),
                F.when(matched, joined["__lfts_key"]).alias("key"),
                F.lit(None).cast("string").alias("error"),
            ),
        ).drop("__lfts_k", "__lfts_v", "__lfts_key")


class ExactFrameJoin(ExactBroadcastJoin):
    """Exact probe against a DICTIONARY TABLE — a (key, value) DataFrame
    instead of an in-memory pairs list. The 100 TB dictionary story: the
    reference can only load files into a Ruby hash; at cluster scale the
    dictionary is itself a table (a parquet/Iceberg dimension, a derived
    frame), possibly too large to hold on the driver at all.

    ``broadcast`` is three-state:
      * ``True`` (default) — force the broadcast-hash-join plane (the
        dictionary fits executor memory: up to ~hundreds of MB).
      * ``None`` — defer the join strategy to Catalyst+AQE: a small
        dimension still broadcasts at runtime; a huge one shuffle-plans
        on AQE's measured sizes.
      * ``False`` — the dictionary is DECLARED beyond broadcast (fits no
        single machine): the dict side carries a merge join hint, so the
        pinned plan is a genuine shuffle (sort-merge) join at any data
        size — the plane a 10^9-entry dictionary runs, testable without
        materializing one. The hint survives AQE re-planning (verified
        in the pinned digest), exactly how a production job pins the
        strategy for a known-huge dimension whose size estimate can't be
        trusted not to OOM a broadcast.
    Duplicate keys are resolved deterministically (lowest value wins) to
    keep the one-value-per-key dictionary contract.
    """

    def __init__(
        self,
        dict_df: DataFrame,
        key_col: str,
        value_col: str,
        broadcast: Optional[bool] = True,
    ):
        value_field = dict_df.schema[value_col]
        self.value_type = value_field.dataType
        self.values_are_json = False
        self.broadcast = broadcast
        dedup = (
            dict_df.select(
                F.col(key_col).cast("string").alias("__lfts_k"),
                F.col(value_col).alias("__lfts_v"),
            )
            .groupBy("__lfts_k")
            .agg(F.min("__lfts_v").alias("__lfts_v"))
        )
        if broadcast is False:
            dedup = dedup.hint("merge")
        self.dict_df = dedup

    def join(self, df: DataFrame, key: Column, result_col: str) -> DataFrame:
        if self.broadcast is True:
            return super().join(df, key, result_col)
        probe = df.withColumn("__lfts_key", key)
        joined = probe.join(
            self.dict_df,
            probe["__lfts_key"].eqNullSafe(self.dict_df["__lfts_k"]),
            "left",
        )
        matched = joined["__lfts_k"].isNotNull()
        return joined.withColumn(
            result_col,
            F.struct(
                matched.alias("matched"),
                F.when(matched, joined["__lfts_v"]).alias("value"),
                F.when(matched, joined["__lfts_key"]).alias("key"),
                F.lit(None).cast("string").alias("error"),
            ),
        ).drop("__lfts_k", "__lfts_v", "__lfts_key")


# ---------------------------------------------------------------------------
# O2 — ordered first-match regex
# ---------------------------------------------------------------------------

class RegexFirstMatch(LookupStrategy):
    """Probe each dictionary key as a regex **in insertion order**, first
    unanchored match wins (fetch_strategy/memory.rb:18-33: ordered ``detect``
    + ``source.match``). Arrow-vectorized pandas UDF; patterns are shipped as
    strings and compiled once per executor on first batch.
    """

    mode = "regex"

    def __init__(
        self,
        pairs: Pairs,
        dialect: str = "python",
        fault_pattern: Optional[str] = None,
    ):
        #: ``fault_pattern``: deterministic fault injector for O10
        #: containment parity — rows whose key matches raise INSIDE the
        #: guarded per-row path, exactly how the reference's own spec
        #: exercises containment (translate_spec.rb:738-742 mocks the
        #: updater to raise; translate.rb:266-270 rescues and tags). The
        #: raise happens before any lookup so the row comes out
        #: unmatched + error → route='failed', pass-through unenriched.
        self._fault_pattern = fault_pattern
        if fault_pattern is not None:
            re.compile(fault_pattern)  # fail fast at plan time
        self.value_type, conv, self.values_are_json = infer_value_type(pairs)
        self._table: List[Tuple[str, Any]] = [(str(k), conv(v)) for k, v in pairs]
        # fail fast at plan time on invalid patterns (reference raises at
        # register when compiling — fetch_strategy/memory.rb:22)
        compiled_probe = [re.compile(k) for k, _ in self._table]
        # the union prefilter concatenates patterns, which RENUMBERS
        # capturing groups — a pattern using a backreference (e.g. (a)\1)
        # would silently never match in the union and short-circuit to a
        # false miss. Decide safety once at plan time and ship the flag.
        self._union_ok = len(self._table) > 4 and not any(
            c.groups > 0 or re.search(r"\\\d", k)
            for c, (k, _) in zip(compiled_probe, self._table)
        )
        self._result_type = lookup_result_type(self.value_type)
        self._scalar_udf = self._build_udf(array=False)
        self._array_udf = self._build_udf(array=True)

    def _build_udf(self, array: bool):
        table = self._table
        union_ok = self._union_ok
        fault_pattern = self._fault_pattern
        result_type = self._result_type
        ret = T.ArrayType(result_type) if array else result_type

        def lookup_one(s, compiled, union_pat, fault=None):
            if s is None:
                return {"matched": False, "value": None, "key": None, "error": None}
            try:
                if fault is not None and fault.search(s):
                    raise RuntimeError(
                        f"injected lookup fault for {s!r} "
                        "(translate_spec.rb:738-742 containment parity)"
                    )
                # miss prefilter: one union-regex probe short-circuits the
                # O(keys) ordered scan for non-matching rows (the "could be
                # expensive" caveat at translate.rb:143-144)
                if union_pat is not None and not union_pat.search(s):
                    return {
                        "matched": False, "value": None, "key": None,
                        "error": None,
                    }
                for pat, raw_key, val in compiled:
                    if pat.search(s):
                        return {
                            "matched": True,
                            "value": val,
                            "key": raw_key,
                            "error": None,
                        }
                return {"matched": False, "value": None, "key": None, "error": None}
            except Exception as exc:  # error containment (translate.rb:266-270)
                return {
                    "matched": False,
                    "value": None,
                    "key": None,
                    "error": f"{type(exc).__name__}: {exc}",
                }

        def build():
            compiled = [(re.compile(k), k, v) for k, v in table]
            try:
                union = (
                    re.compile("|".join(f"(?:{k})" for k, _ in table))
                    if union_ok
                    else None
                )
            except re.error:
                union = None  # e.g. mixed flags; fall back to the plain scan
            fault = re.compile(fault_pattern) if fault_pattern else None
            return compiled, union, fault

        if array:

            @pandas_udf(ret)
            def udf(col: pd.Series) -> pd.Series:
                compiled, union, fault = build()
                out = []
                for arr in col:
                    if arr is None:
                        out.append(None)
                    else:
                        out.append(
                            [
                                lookup_one(
                                    None if x is None else str(x), compiled,
                                    union, fault,
                                )
                                for x in arr
                            ]
                        )
                return pd.Series(out)

        else:

            @pandas_udf(ret)
            def udf(col: pd.Series) -> pd.DataFrame:
                compiled, union, fault = build()
                rows = [lookup_one(s, compiled, union, fault) for s in col]
                return pd.DataFrame(rows)

        return udf

    def expr(self, key: Column) -> Column:
        return self._scalar_udf(key)

    def expr_array(self, arr: Column) -> Column:
        return self._array_udf(arr)

    def when_chain_expr(self, key: Column) -> Column:
        """Pure-Catalyst alternative for small dictionaries: an ordered
        ``coalesce(when(rlike ...))`` chain — key order becomes ``when``
        order. Java regex dialect; kept for plans that must stay
        codegen-only."""
        conv_type = self.value_type
        miss = F.struct(
            F.lit(False).alias("matched"),
            F.lit(None).cast(conv_type).alias("value"),
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("string").alias("error"),
        )
        result = miss
        for k, v in reversed(self._table):
            hit = F.struct(
                F.lit(True).alias("matched"),
                F.lit(v).cast(conv_type).alias("value"),
                F.lit(k).alias("key"),
                F.lit(None).cast("string").alias("error"),
            )
            result = F.when(key.isNotNull() & key.rlike(k), hit).otherwise(result)
        return result


# ---------------------------------------------------------------------------
# O3 — union-regex substitution
# ---------------------------------------------------------------------------

class UnionSubstitution(LookupStrategy):
    """``gsub(Regexp.union(keys), dict)``: single-pass replacement of every
    occurrence of every (literal-escaped) key, alternation in insertion
    order; miss ⇔ output == input (fetch_strategy/memory.rb:35-49).
    Values are coerced to strings (substitution into a string)."""

    mode = "union"

    def __init__(self, pairs: Pairs, prefer_native: bool = True):
        self.value_type = T.StringType()
        self.values_are_json = False
        self._table: List[Tuple[str, str]] = [
            (str(k), ruby_to_s(v)) for k, v in pairs
        ]
        self._result_type = lookup_result_type(T.StringType())
        self.native = prefer_native and self._native_safe()
        self._scalar_udf = None if self.native else self._build_udf(array=False)
        self._array_udf = None if self.native else self._build_udf(array=True)

    #: above this many keys the pairwise equivalence proof (O(n²·keylen))
    #: is too expensive at plan time AND the nested replace-chain expression
    #: tree would be unreasonable — always use the Arrow UDF plane
    NATIVE_MAX_KEYS = 64

    def _native_safe(self) -> bool:
        """True when a sequential JVM ``replace`` chain is provably
        equivalent to the single-pass union sub.

        Conditions (all rejections, conservative):
          - keys must not overlap each other in any text (no substring
            relations, no suffix-of-one == prefix-of-another) — otherwise
            pass order vs alternation order diverge;
          - no replacement VALUE may overlap any key in any way (key inside
            value, value inside key, value-suffix == key-prefix, key-suffix
            == value-prefix) — otherwise an inserted value can combine with
            adjacent original text to form a later key that the sequential
            chain replaces but the single-pass gsub (which never rescans
            replaced output) does not. Example: dict [("ab","c"),("cd","z")]
            on "abd" — chain gives "z", single-pass gives "cd".

        Then each source position is consumed by at most one key, replaced
        output can never re-trigger, and pass order cannot matter. The JVM
        plane keeps this hot path inside whole-stage codegen — the Arrow UDF
        plane is the fallback for interacting dictionaries (and for big
        dictionaries, where the pairwise proof itself would hang plan time).
        """
        keys = [k for k, _ in self._table]
        vals = [v for _, v in self._table]
        if len(keys) > self.NATIVE_MAX_KEYS:
            return False
        if any(k == "" for k in keys):
            return False
        for i, a in enumerate(keys):
            for j, b in enumerate(keys):
                if i == j:
                    continue
                if a in b:
                    return False
                for cut in range(1, min(len(a), len(b))):
                    if a[-cut:] == b[:cut]:
                        return False
        # an empty value DELETES the key, merging the adjacent original
        # texts — a later key can match across that junction without ever
        # overlapping the (empty) inserted value, so the boundary checks
        # below are blind to it; only a single-key dictionary is safe
        if any(v == "" for v in vals) and len(keys) > 1:
            return False
        for v in vals:
            if not v:
                continue
            for k in keys:
                if k in v or v in k:
                    return False
                for cut in range(1, min(len(k), len(v))):
                    if v[-cut:] == k[:cut]:  # value tail + original = key
                        return False
                    if k[-cut:] == v[:cut]:  # original + value head = key
                        return False
        return True

    def native_expr(self, key: Column) -> Column:
        out = key
        for k, v in self._table:
            out = F.replace(out, F.lit(k), F.lit(v))
        matched = key.isNotNull() & (out != key)
        return F.struct(
            matched.alias("matched"),
            F.when(matched, out).alias("value"),
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("string").alias("error"),
        )

    def _build_udf(self, array: bool):
        table = self._table
        ret = T.ArrayType(self._result_type) if array else self._result_type

        def build_pattern():
            if not table:
                return None, {}
            mapping = dict(table)
            pat = re.compile("|".join(re.escape(k) for k, _ in table))
            return pat, mapping

        def sub_one(s, pat, mapping):
            if s is None:
                return {"matched": False, "value": None, "key": None, "error": None}
            try:
                if pat is None:
                    return {
                        "matched": False,
                        "value": None,
                        "key": None,
                        "error": None,
                    }
                first_key = [None]

                def repl(m):
                    if first_key[0] is None:
                        first_key[0] = m.group(0)
                    return mapping[m.group(0)]

                out = pat.sub(repl, s)
                if out == s:  # miss ⇔ unchanged (memory.rb:43-44)
                    return {
                        "matched": False,
                        "value": None,
                        "key": None,
                        "error": None,
                    }
                return {
                    "matched": True,
                    "value": out,
                    "key": first_key[0],
                    "error": None,
                }
            except Exception as exc:
                return {
                    "matched": False,
                    "value": None,
                    "key": None,
                    "error": f"{type(exc).__name__}: {exc}",
                }

        if array:

            @pandas_udf(ret)
            def udf(col: pd.Series) -> pd.Series:
                pat, mapping = build_pattern()
                out = []
                for arr in col:
                    if arr is None:
                        out.append(None)
                    else:
                        out.append(
                            [
                                sub_one(
                                    None if x is None else str(x), pat, mapping
                                )
                                for x in arr
                            ]
                        )
                return pd.Series(out)

        else:

            @pandas_udf(ret)
            def udf(col: pd.Series) -> pd.DataFrame:
                pat, mapping = build_pattern()
                rows = [sub_one(s, pat, mapping) for s in col]
                return pd.DataFrame(rows)

        return udf

    def expr(self, key: Column) -> Column:
        if self.native:
            return self.native_expr(key)
        return self._scalar_udf(key)

    def expr_array(self, arr: Column) -> Column:
        if self.native:
            return F.transform(arr, lambda x: self.native_expr(x.cast("string")))
        return self._array_udf(arr)


def build_strategy(
    mode: str,
    pairs: Pairs,
    spark=None,
    exact_join_threshold: int = MAP_LITERAL_MAX_ENTRIES,
    force_join: bool = False,
    nested: str = "json",
) -> LookupStrategy:
    """Pick the physical strategy for a logical mode.

    exact: map literal below ``exact_join_threshold`` entries, broadcast
    hash join above (or when ``force_join``). regex/union: vectorized UDFs.
    ``nested``: value typing for nested dictionary values ("json" legacy
    strings | "typed" array/VARIANT columns) — exact mode only.
    """
    if mode == "exact":
        if force_join or (len(pairs) > exact_join_threshold and spark is not None):
            if spark is None:
                raise ValueError("broadcast-join strategy needs a SparkSession")
            return ExactBroadcastJoin(spark, pairs, nested=nested)
        return ExactMapLiteral(pairs, nested=nested)
    if mode == "regex":
        return RegexFirstMatch(pairs)
    if mode == "union":
        return UnionSubstitution(pairs)
    raise ValueError(f"unknown lookup mode {mode!r}")
