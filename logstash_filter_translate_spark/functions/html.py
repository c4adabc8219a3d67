"""HTML/url parse stage (axis B): vectorized text extraction and grok-style
field parsing.

Two extraction planes, tested byte-identical:
  - native: ``regexp_extract`` over the decoded html — whole-stage codegen,
    zero Python; the default hot path.
  - arrow:  a pandas UDF with a compiled ``re`` pattern — the
    "vectorized Arrow/pandas UDF" plane the north star names; used when
    extraction logic outgrows a single regex (real-world boilerplate
    removal), and as the template for custom extractors.

Per-row invariant (BASELINE.json.input_hint): extract_text(html) == text
byte-identically — guaranteed by the page template (plans/pages.py) and
asserted in tests + the e2e pipeline observe() metric.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_TEXT_RE = r"(?s)<p>(.*)</p>"
_STATUS_RE = r'<meta http-equiv="Status" content="([^"]*)"'
_LANG_RE = r'<meta name="lang" content="([^"]*)"'
_URL_RE = r"^https?://([^/.]+)\.example\.([a-z]+)(/.*)?$"


def html_str(html_bin: Column) -> Column:
    """binary → string as a zero-copy UTF8String wrap (``cast``), NOT
    ``F.decode(..., 'UTF-8')``: decode round-trips through a java.lang
    String (bytes → UTF-16 String → UTF8String = 3 copies + 2x inflation),
    which at corpus scale is pure memory-bandwidth burn — measured ~15%
    slower on the 40M-row parse path at every parallelism level (r5 A/B).
    Spark's internal string type IS UTF-8 bytes, so for UTF-8 input the
    two are value-identical (asserted over the corpus generator).

    PRECONDITION (r5 advice): the input must be VALID UTF-8. ``cast``
    wraps raw bytes while ``decode`` substitutes U+FFFD for malformed
    sequences, so on non-UTF-8 input the two silently diverge. The
    generated corpus guarantees validity by construction (html is
    ``F.encode(string, 'UTF-8')``); for an UNTRUSTED external crawl use
    :func:`html_str_untrusted` at the ingest seam instead — valid rows
    still take this zero-copy path, malformed rows fall back to the
    charset-converting decode."""
    return html_bin.cast("string")


def html_str_untrusted(html_bin: Column) -> Column:
    """binary → string for sources that may carry malformed UTF-8 (real
    crawl data): ``make_valid_utf8`` returns valid input UNCHANGED (the
    zero-copy wrap survives) and substitutes U+FFFD for malformed
    sequences — the reference's charset-converting behavior, without the
    ANSI-mode ``decode`` throw ([MALFORMED_CHARACTER_CODING]). Fully
    codegen'd; the validity scan costs only at the ingest seam — internal
    stages keep the plain :func:`html_str` fast path because everything
    downstream of this seam is valid by construction."""
    return F.make_valid_utf8(html_bin.cast("string"))


def extract_text_from_str(s: Column) -> Column:
    x = F.regexp_extract(s, _TEXT_RE, 1)
    return F.when(x != "", x)


def extract_status_from_str(s: Column) -> Column:
    x = F.regexp_extract(s, _STATUS_RE, 1)
    return F.when(x != "", x)


def extract_lang_from_str(s: Column) -> Column:
    x = F.regexp_extract(s, _LANG_RE, 1)
    return F.when(x != "", x)


def extract_text_native(html_bin: Column) -> Column:
    """JVM-side extraction; empty match → NULL (not '')."""
    return extract_text_from_str(html_str(html_bin))


@pandas_udf(T.StringType())
def extract_text_arrow(html: pd.Series) -> pd.Series:
    pat = re.compile(_TEXT_RE)

    def one(b):
        if b is None:
            return None
        m = pat.search(bytes(b).decode("utf-8"))
        return m.group(1) if m and m.group(1) else None

    return html.map(one)


@pandas_udf(T.StringType())
def extract_text_arrow_untrusted(html: pd.Series) -> pd.Series:
    """Arrow extraction plane for untrusted bytes: malformed UTF-8 decodes
    with U+FFFD substitution (``errors='replace'``) — the Python twin of
    :func:`html_str_untrusted`'s make_valid_utf8 — instead of raising
    UnicodeDecodeError inside the worker."""
    pat = re.compile(_TEXT_RE)

    def one(b):
        if b is None:
            return None
        m = pat.search(bytes(b).decode("utf-8", errors="replace"))
        return m.group(1) if m and m.group(1) else None

    return html.map(one)


def extract_status(html_bin: Column) -> Column:
    x = F.regexp_extract(html_str(html_bin), _STATUS_RE, 1)
    return F.when(x != "", x)


def extract_lang_header(html_bin: Column) -> Column:
    x = F.regexp_extract(html_str(html_bin), _LANG_RE, 1)
    return F.when(x != "", x)


def parse_url(url: Column):
    """grok-ish url parse → (host, tld, path).

    ONE regex execution per row: the match is rewritten to a
    \\x01-separated triple and split — three ``regexp_extract`` calls would
    each re-run the same pattern (3× the regex cost in the hot parse
    stage). No match → the url has no \\x01 → all three NULL."""
    packed = F.regexp_replace(url, _URL_RE, "$1\x01$2\x01$3")
    parts = F.when(packed.contains("\x01"), F.split(packed, "\x01", -1))
    host = F.try_element_at(parts, F.lit(1))
    tld = F.try_element_at(parts, F.lit(2))
    path = F.try_element_at(parts, F.lit(3))
    return (
        F.when(host != "", host).alias("host"),
        F.when(tld != "", tld).alias("tld"),
        F.when(path != "", path).alias("path"),
    )
