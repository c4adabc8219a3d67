"""Text-analysis primitives for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting, portable
hashing, shingling.

Design constraints:
  - everything stays JVM-side (built-in pyspark.sql.functions, whole-stage
    codegen) — no Python in the hot path;
  - every function has an exact ANSI-SQL equivalent so the DuckDB oracle can
    verify it value-for-value (the md5-based 32-bit hash is the portable
    hashing primitive: Spark ``conv(substr(md5(x),1,8),16,10)`` ==
    DuckDB ``cast('0x'||substr(md5(x),1,8) as bigint)``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------

def hash32(col: Column) -> Column:
    """Deterministic unsigned 32-bit hash from the md5 hex prefix.

    Portable across engines (unlike xxhash64/murmur which differ between
    Spark and DuckDB). Cost: one md5 per value — fine for shingle-scale
    cardinalities; use F.xxhash64 where cross-engine parity isn't needed.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# fixed MinHash coefficients (a*h + b) mod p — deterministic, no RNG at
# plan time; p is the Mersenne prime 2^31-1
MINHASH_P = 2147483647
MINHASH_COEF: List[Tuple[int, int]] = [
    (1299721, 104729),
    (15485863, 32452843),
    (49979687, 67867967),
    (86028121, 15485867),
    (22801763, 49979693),
    (67867979, 86028157),
    (32452867, 22801777),
    (104729, 1299709),
]


# ---------------------------------------------------------------------------
# tokenization & shingles
# ---------------------------------------------------------------------------

def tokens(text: Column) -> Column:
    """Whitespace tokens; empty string → empty array (matches DuckDB
    ``string_split(text,' ')`` filtered of empties)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; fewer than n tokens → empty array.

    Pure expression: transform over an index sequence + element_at — no
    explode/shuffle. (The DuckDB oracle states the same set via a pos
    self-join.)
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingled = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    # guard: sequence(1, k) DESCENDS for k < 1 — short docs must yield []
    return F.when(F.size(toks) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles: Column, num_hashes: int = 8) -> List[Column]:
    """MinHash signature columns over a shingle array; empty array → NULLs."""
    h = F.transform(shingles, lambda s: hash32(s))
    sigs = []
    for i in range(num_hashes):
        a, b = MINHASH_COEF[i % len(MINHASH_COEF)]
        sigs.append(
            F.array_min(
                F.transform(h, lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P)
            ).alias(f"m{i}")
        )
    return sigs


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

#: a real word tuple (code-review r7: a trailing comma had made this a
#: 1-tuple holding one 40-char space-joined "word" — any consumer
#: iterating it as a stopword list silently matched nothing)
DEFAULT_STOPWORDS = tuple(
    "the a an and or of to in is are was for on with as by at it this that"
    .split()
)


def quality_metrics(text: Column) -> List[Column]:
    """Length / punctuation / token statistics used for quality filtering.
    All expressible in ANSI SQL (length + regexp_replace deltas)."""
    n_chars = F.length(text).alias("n_chars_q")
    toks = tokens(text)
    n_tokens = F.size(toks).alias("n_tokens")
    punct = (
        F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    ).alias("n_punct")
    digits = (
        F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    ).alias("n_digits")
    mean_tok_len = F.when(
        F.size(toks) > 0,
        (
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            )
            / F.size(toks)
        ),
    ).alias("mean_token_len")
    return [n_chars, n_tokens, punct, digits, mean_tok_len]


def quality_score(text: Column) -> Column:
    """0..3 heuristic score: long enough, not digit-heavy, sane token length.
    Deterministic integer so oracles compare exactly."""
    toks = tokens(text)
    n_tok = F.size(toks)
    digits = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    long_enough = (n_tok >= 10).cast("int")
    low_digit = (digits * 10 < F.length(text)).cast("int")
    mean_len_ok = F.when(
        n_tok > 0,
        (
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            .cast("double")
            / n_tok
        ).between(2.0, 12.0),
    ).otherwise(F.lit(False)).cast("int")
    return (long_enough + low_digit + mean_len_ok).alias("quality_score")


#: BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs —
#: ASCII subset of the GPT-2 pre-tokenizer pattern, dialect-neutral across
#: Java regex (Spark) and RE2 (DuckDB)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (DuckDB:
    ``len(regexp_extract_all(text, pat))``)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

ROLLING_B = 131
ROLLING_P = 2147483647
ROLLING_WINDOW = 64
#: B^i mod P for i in 0..63 — plan literals, identical in the SQL oracle
ROLLING_POWS = []
_acc = 1
for _ in range(ROLLING_WINDOW):
    ROLLING_POWS.append(_acc)
    _acc = (_acc * ROLLING_B) % ROLLING_P


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial (Rabin-Karp-style) rolling hash of the first 64 chars:
    ``Σ ascii(ch_i) * B^i  mod P`` — the incremental-update form is what a
    streaming dedup shingler uses; the fixed-window form here is its
    oracle-checkable anchor."""
    pows = F.array(*[F.lit(p) for p in ROLLING_POWS])
    idx = F.sequence(F.lit(1), F.least(F.length(text), F.lit(ROLLING_WINDOW)))
    terms = F.transform(
        idx,
        lambda i: F.ascii(F.substring(text, 1, ROLLING_WINDOW).substr(i, F.lit(1)))
        .cast("long")
        * F.element_at(pows, i),
    )
    return F.when(
        text.isNotNull() & (F.length(text) > 0),
        F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x) % ROLLING_P,
    )

def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (DuckDB: ``md5(lower(regexp_replace(text,'\\s+',' ','g')))``)."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword profile heuristic)
# ---------------------------------------------------------------------------

def langid_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    profiles: Sequence[Tuple[str, Sequence[str]]],
) -> DataFrame:
    """Heuristic language ID: argmax over per-language marker-word hit
    counts. Explode tokens → broadcast join against the marker table →
    count → window argmax. Returns (id_col, lang_id) with 'und' when no
    marker hits.

    At 100 TB scale: the token explode is map-side; the join side is tiny
    and broadcast; the argmax groupBy shuffles only (doc_id, lang) partial
    counts thanks to partial aggregation, and the final argmax is a
    ``min_by`` partial aggregate too (r9 — the old row_number window
    forced an exchange + SORT of the scored rows; ``min_by(lang,
    struct(-hits, lang))`` picks the identical winner — hits DESC, lang
    ASC on ties — with map-side combine and no sort).
    """
    spark = df.sparkSession
    marker_rows = [(lang, w) for lang, words in profiles for w in words]
    markers = spark.createDataFrame(marker_rows, "lang_cand string, w string")
    tok = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("w"))
    scores = (
        tok.join(F.broadcast(markers), "w")
        .groupBy(id_col, "lang_cand")
        .agg(F.count("*").alias("hits"))
    )
    best = scores.groupBy(id_col).agg(
        F.min_by(
            "lang_cand",
            F.struct((-F.col("hits")).alias("h"), F.col("lang_cand").alias("l")),
        ).alias("lang_id")
    )
    return df.select(id_col).join(best, id_col, "left").select(
        id_col, F.coalesce("lang_id", F.lit("und")).alias("lang_id")
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data scrub)
# ---------------------------------------------------------------------------

#: default redaction rules: (pattern, replacement-token). Patterns stay in
#: the Java-regex ∩ RE2 common subset so the DuckDB oracle states the same
#: substitution; extend per deployment (SSNs, IBANs, ...).
PII_RULES: List[Tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}", "<PHONE>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact(col: Column, rules: List[Tuple[str, str]] = PII_RULES) -> Column:
    """Replace every occurrence of every rule pattern with its token — the
    standard pre-training PII scrub, as a whole-stage-codegen
    ``regexp_replace`` chain (one pass per rule, JVM-side, no Python).
    Rule order matters: earlier rules consume their text first (an email
    is redacted before the IP rule could see its host part)."""
    out = col
    for pattern, token in rules:
        out = F.regexp_replace(out, pattern, token)
    return out


def redaction_counts(
    col: Column, rules: List[Tuple[str, str]] = PII_RULES
) -> List[Column]:
    """Per-rule match counts (audit metric for the scrub) — codegen
    ``regexp_count``. Each rule is counted against the text with all EARLIER
    rules already applied (the same chaining ``redact`` uses), so counts
    equal actual substitutions even when rule matches overlap — e.g. an
    IP-shaped or phone-shaped substring inside an email that the email rule
    consumed first is not double-counted (round-3 advice)."""
    out: List[Column] = []
    cur = col
    for pattern, token in rules:
        out.append(F.regexp_count(cur, F.lit(pattern)))
        cur = F.regexp_replace(cur, pattern, token)
    return out
