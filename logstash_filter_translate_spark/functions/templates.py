"""Logstash ``%{field}`` sprintf templates compiled to Column expressions.

Reference behavior (event.sprintf, used by the fallback option,
/root/reference/lib/logstash/filters/single_value_update.rb:42-44 and
translate_spec.rb:191-207): ``%{name}`` splices the event field's value;
when the field is missing the literal ``%{name}`` text is left in place.

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


def _field_to_column(name: str) -> Column:
    """``[a][b]`` nested refs -> ``a.b``; bare names pass through."""
    if name.startswith("[") and name.endswith("]"):
        parts = [p for p in re.split(r"\]\[|\[|\]", name) if p]
        return F.col(".".join(parts))
    return F.col(name)


def sprintf_fields(template: str) -> List[str]:
    """Top-level column names a ``%{field}`` template references (nested
    ``[a][b]`` refs report the top-level ``a``). Used to carry exactly the
    referenced columns through explode planes."""
    out: List[str] = []
    for m in _FIELD_REF.finditer(template):
        name = m.group(1)
        top = (
            name[1:].split("]", 1)[0]
            if name.startswith("[")
            else name.split("[", 1)[0]
        )
        if top and top not in out:
            out.append(top)
    return out


def compile_sprintf(template: str, columns: Optional[List[str]] = None) -> Column:
    """Compile a sprintf template to a Column.

    ``columns`` — when given (the DataFrame's schema), references to columns
    not in it resolve to the literal ``%{name}`` (Logstash leaves missing
    fields un-spliced) instead of an analysis error.
    """
    pieces: List[Column] = []
    pos = 0
    for m in _FIELD_REF.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
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
