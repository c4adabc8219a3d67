"""Logstash ``%{field}`` sprintf templates compiled to Column expressions.

Reference behavior (event.sprintf, used by the fallback option,
/root/reference/lib/logstash/filters/single_value_update.rb:42-44 and
translate_spec.rb:191-207): ``%{name}`` splices the event field's value;
when the field is missing the literal ``%{name}`` text is left in place.
``%{+FORMAT}`` formats the event timestamp with a Joda-style pattern
(``%{+YYYY.MM.dd}`` — the reference's Event#sprintf grammar), and the
special ``%{+%s}`` splices epoch seconds; here the designated timestamp
column (default ``warc_ts``, the corpus's event time) plays @timestamp's
role and the pattern compiles to JVM-side ``date_format``.

Compiled once at plan time into ``concat`` of literals and
``coalesce(cast(col as string), lit('%{name}'))`` pieces — a pure Catalyst
projection, no per-row Python.
"""

from __future__ import annotations

import re
from typing import List, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

_FIELD_REF = re.compile(r"%\{([^}]+)\}")

#: the column standing in for Logstash's always-present @timestamp in
#: ``%{+FORMAT}`` time references (input contract: warc_ts:timestamp)
DEFAULT_TS_COL = "warc_ts"


def _joda_to_spark_pattern(pattern: str) -> str:
    """Rewrite a Joda-Time pattern (Logstash's Event#sprintf grammar) to
    Spark's DateTimeFormatter pattern. The tokens they disagree on:
    Joda ``Y`` = year-of-era (→ Java ``y``; Java's ``Y`` is week-based-year,
    which would silently shift dates near New Year) and Joda ``x`` =
    weekyear (→ Java ``Y``). Everything else — y M d H h m s S E D w a K k
    z G and quoted literals — is shared grammar and passes through."""
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "'":
            # quoted literal: copy verbatim through the closing quote
            # (an embedded '' is an escaped quote, not a terminator)
            j = i + 1
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(pattern[i : j + 1])
            i = j + 1
            continue
        if c.isalpha():
            j = i
            while j < n and pattern[j] == c:
                j += 1
            out.append({"Y": "y", "x": "Y"}.get(c, c) * (j - i))
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _time_ref_column(pattern: str, ts_col: str, literal: str) -> Column:
    """``%{+FORMAT}`` → date_format over the designated timestamp column;
    ``%{+%s}`` → epoch seconds (the reference's special case). NULL
    timestamp degrades to the literal text, same as a missing field."""
    if pattern == "%s":
        formatted = F.unix_timestamp(F.col(ts_col)).cast("string")
    else:
        formatted = F.date_format(F.col(ts_col), _joda_to_spark_pattern(pattern))
    return F.coalesce(formatted, F.lit(literal))


def _field_to_column(name: str) -> Column:
    """``[a][b]`` nested refs -> ``a.b``; bare names pass through."""
    if name.startswith("[") and name.endswith("]"):
        parts = [p for p in re.split(r"\]\[|\[|\]", name) if p]
        return F.col(".".join(parts))
    return F.col(name)


def sprintf_fields(
    template: str, ts_col: str = DEFAULT_TS_COL
) -> List[str]:
    """Top-level column names a ``%{field}`` template references (nested
    ``[a][b]`` refs report the top-level ``a``; ``%{+FORMAT}`` time refs
    report the designated timestamp column). Used to carry exactly the
    referenced columns through explode planes."""
    out: List[str] = []
    for m in _FIELD_REF.finditer(template):
        name = m.group(1)
        if name.startswith("+"):
            top = ts_col
        else:
            top = (
                name[1:].split("]", 1)[0]
                if name.startswith("[")
                else name.split("[", 1)[0]
            )
        if top and top not in out:
            out.append(top)
    return out


def compile_sprintf(
    template: str,
    columns: Optional[List[str]] = None,
    ts_col: str = DEFAULT_TS_COL,
) -> Column:
    """Compile a sprintf template to a Column.

    ``columns`` — when given (the DataFrame's schema), references to columns
    not in it resolve to the literal ``%{name}`` (Logstash leaves missing
    fields un-spliced) instead of an analysis error. ``%{+FORMAT}`` time
    references format ``ts_col`` (the frame's event-time column); they too
    degrade to the literal when that column is absent.
    """
    pieces: List[Column] = []
    pos = 0
    for m in _FIELD_REF.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name.startswith("+"):
            if columns is not None and ts_col not in columns:
                pieces.append(F.lit(m.group(0)))
            else:
                pieces.append(_time_ref_column(name[1:], ts_col, m.group(0)))
            pos = m.end()
            continue
        top = name.split("[", 1)[0] if not name.startswith("[") else name[1:].split("]", 1)[0]
        if columns is not None and top not in columns:
            pieces.append(F.lit(m.group(0)))
        else:
            pieces.append(
                F.coalesce(
                    _field_to_column(name).cast("string"), F.lit(m.group(0))
                )
            )
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)
