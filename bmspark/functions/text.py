"""Text-analysis surface for training-data pipelines.

Every function here is deliberately expressed with JVM built-ins
(whole-stage-codegen'd, no Python) AND has a semantically identical DuckDB
SQL form (the *_SQL constants) so the driver oracle verifies it
value-for-value. At 100 TB these run inside the same codegen stage as the
scan — zero extra passes, zero Python workers.

Members: token counting, document fingerprinting, quality scoring,
language-ID heuristic (SURVEY.md §2.7 + training-data extras).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- token counting ---------------------------------------------------------

def token_count(text: str | Column) -> Column:
    """Whitespace tokenization count. split on \\s+ after trim; empty
    string → 0 (size of split('') is 1, so special-case)."""
    t = F.trim(_c(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


TOKEN_COUNT_SQL = (
    "CASE WHEN trim({t}) = '' THEN 0 "
    "ELSE len(string_split_regex(trim({t}), '\\s+')) END"
)

# -- BPE-ish subword token estimate (regex segmentation) --------------------

def subword_count(text: str | Column) -> Column:
    """BPE-ish token-count estimate: segments = runs of letters, runs of
    digits, or single non-space symbols (a GPT-2-style pre-tokenizer
    regex). Counts segments plus one extra per 4 letters within a run
    (approximating subword splits of long words)."""
    t = _c(text)
    words = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    letters = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    return (words + F.floor(letters / F.lit(8))).cast("long")


SUBWORD_COUNT_SQL = (
    "len(regexp_extract_all({t}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) "
    "+ (length(regexp_replace({t}, '[^A-Za-z]', '', 'g')) // 8)"
)

# -- fingerprinting ---------------------------------------------------------

def fingerprint(text: str | Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines (md5 is md5); the content-hash used by exact
    dedup and lineage manifests."""
    norm = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return F.md5(norm)


FINGERPRINT_SQL = (
    "md5(regexp_replace(lower(trim({t})), '\\s+', ' ', 'g'))"
)

# -- quality scoring --------------------------------------------------------

_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]
_STOP_IN = ", ".join(f"'{w}'" for w in _STOPWORDS)


def quality_score(text: str | Column) -> Column:
    """Heuristic quality score in [0,1]:
      0.4 * length_score (saturating at 500 chars)
    + 0.3 * (1 - punct_ratio clipped)
    + 0.3 * stopword_ratio (capped at 0.3 → rescaled)
    Deterministic, built-ins only, mirrored in QUALITY_SQL."""
    t = _c(text)
    n = F.length(t)
    toks = F.split(F.trim(t), r"\s+")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    stop = F.size(F.filter(toks, lambda x: x.isin(_STOPWORDS)))
    punct = n - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct / F.greatest(n, F.lit(1)) * 10, F.lit(1.0))
    stop_score = F.least(stop / n_tok / F.lit(0.3), F.lit(1.0))
    raw = 0.4 * length_score + 0.3 * punct_score + 0.3 * stop_score
    # floor-truncate instead of round: identical doubles floor identically
    # in every engine, while round-half-up vs banker's rounding can differ
    return F.floor(raw * 10000) / 10000


QUALITY_SQL = (
    "floor(("
    "0.4 * least(length({t}) / 500.0, 1.0) "
    "+ 0.3 * (1.0 - least((length({t}) - length(regexp_replace({t}, '[.,!?;:]', '', 'g')))"
    "::DOUBLE / greatest(length({t}), 1) * 10, 1.0)) "
    "+ 0.3 * least(len(list_filter(string_split_regex(trim({t}), '\\s+'), "
    f"x -> x IN ({_STOP_IN})))"
    "::DOUBLE / greatest(len(string_split_regex(trim({t}), '\\s+')), 1) / 0.3, 1.0)"
    ") * 10000) / 10000"
)

# -- winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) ----------

#: k-gram width (word 3-grams) and winnow window (guarantee t = w+k-1: any
#: shared run of ≥6 tokens yields at least one shared fingerprint).
WINNOW_K = 3
WINNOW_W = 4


def _hash60(s: Column) -> Column:
    """Engine-portable 60-bit hash: first 15 hex chars of md5 as a long.
    md5 is md5 in every engine; 15 hex chars stay inside signed int64."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE and expose it to ``fn`` as a bound lambda
    variable. Catalyst substitutes expression trees referenced inside
    higher-order-function lambdas and re-evaluates them PER ELEMENT —
    an O(n) expression referenced in an O(n)-element lambda silently
    goes O(n²) (observed: winnowing re-hashed the full k-gram array for
    every window slice — minutes instead of seconds at 5k docs). A
    single-element transform makes the expression the HOF *argument*
    (evaluated once per row); inside the lambda it's a variable read."""
    return F.transform(F.array(expr), fn)[0]


def winnow_fingerprints(
    text: str | Column, k: int = WINNOW_K, w: int = WINNOW_W
) -> Column:
    """Winnowing document fingerprints: array<struct<pos,fp>>.

    Algorithm (the MOSS scheme): hash every word k-gram of the normalized
    text, slide a window of w hashes, select the minimum per window
    (rightmost on ties), and keep the distinct (position, hash) pairs.
    Guarantees: every match of length ≥ w+k-1 tokens is caught, and no
    match shorter than k tokens is. Position-robust where md5/simhash of
    the whole doc is not — inserting one paragraph leaves the other
    fingerprints intact.

    Execution split (round 8): normalization + tokenization stay JVM
    codegen (lower/trim/regexp_replace/split — locale/regex semantics
    unchanged), while the gram-hash + winnow selection run in ONE
    Arrow-batched pandas UDF: Catalyst higher-order-function lambdas
    are interpreted (CodegenFallback), and the per-window
    slice/reverse/array_position chain dominated every caller
    (measured 1.14 s of dedup_winnow's 2.0 s at sf0.1; the UDF form
    computes the identical values ~3x faster). hashlib.md5 of the same
    UTF-8 bytes == JVM md5, and the selection is pure int64 math —
    value-exact vs the DuckDB twin and vs ``winnow_fingerprints_jvm``
    (the original all-JVM form, kept as the equality-pinned twin in
    tests/test_text_props.py)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<pos: bigint, fp: bigint>>")
    def _winnow(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from hashlib import md5 as _md5

        import numpy as np

        def h60(s: str) -> int:
            return int(_md5(s.encode("utf-8")).hexdigest()[:15], 16)

        for toks_ser in batches:
            out = []
            for toks in toks_ser:
                tl = [""] if toks is None else list(toks)
                n = len(tl)
                if n >= k:
                    g = np.fromiter(
                        (h60(" ".join(tl[i:i + k])) for i in range(n - k + 1)),
                        dtype=np.int64, count=n - k + 1,
                    )
                else:
                    g = np.array([h60(" ".join(tl))], dtype=np.int64)
                m = len(g)
                wlen = min(m, w)
                if wlen == 1:
                    pos = np.arange(1, m + 1, dtype=np.int64)
                    fp = g
                else:
                    # windows as a (wlen, n_win) strided stack; rightmost
                    # min per window = wlen-1 - argmax over the reversed
                    # equality mask (argmax returns the FIRST max)
                    stack = np.stack(
                        [g[j:m - wlen + 1 + j] for j in range(wlen)]
                    )
                    mins = stack.min(axis=0)
                    off = (wlen - 1) - (stack[::-1] == mins).argmax(axis=0)
                    # 1-based gram index of the selected hash, matching
                    # the JVM form's j + wlen - array_position(reverse)
                    pos = np.arange(1, mins.shape[0] + 1) + off
                    fp = mins
                # distinct (pos, fp) keeping first-occurrence order
                pairs = dict.fromkeys(zip(pos.tolist(), fp.tolist()))
                out.append([{"pos": p, "fp": f} for p, f in pairs])
            yield pd.Series(out)

    norm = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return _winnow(F.split(norm, " "))


def winnow_fingerprints_jvm(
    text: str | Column, k: int = WINNOW_K, w: int = WINNOW_W
) -> Column:
    """All-JVM higher-order-function form of ``winnow_fingerprints`` —
    the original implementation, value-identical by construction and
    pinned equal in tests; kept for environments where the Python
    worker path is undesirable. HOF lambdas are interpreted, so this
    form is ~3x slower per doc (round-8 measurement).

    Docs shorter than k tokens get one whole-text gram; fewer than w
    grams collapse to a single window. The token array and the gram-hash
    array are each _bind-ed so they are computed once per row — never
    inside a per-element lambda (see _bind)."""

    def _grams(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: _hash60(F.concat_ws(" ", F.slice(t, i, k))),
            ),
            # concat_ws(" ", t) == the normalized text (t = split on " ")
        ).otherwise(F.array(_hash60(F.concat_ws(" ", t))))

    def _selected(g: Column) -> Column:
        m = F.size(g)
        wlen = F.least(m, F.lit(w))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), m - wlen + 1),
                lambda j: _bind(
                    F.slice(g, j, wlen),
                    lambda win: F.struct(
                        # rightmost occurrence of the window minimum:
                        # position from the END via array_position(reverse)
                        (
                            j + wlen
                            - F.array_position(F.reverse(win), F.array_min(win))
                        ).cast("long").alias("pos"),
                        F.array_min(win).alias("fp"),
                    ),
                ),
            )
        )

    norm = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return _bind(
        F.split(norm, " "),
        lambda toks: _bind(_grams(toks), _selected),
    )


#: DuckDB twin of winnow_fingerprints. Same normalization, same md5-60bit
#: k-gram hash, same rightmost-min winnow. The oracle query stacks these
#: as CTEs: toks → grams → pairs → unnest. Concrete k=3, w=4 (matching
#: WINNOW_K/WINNOW_W); DuckDB list slices are 1-based inclusive, so a
#: k-gram at i is toks[i:i+2] and a window at j is grams[j:j+wlen-1].
WINNOW_TOKS_SQL = (
    "string_split(regexp_replace(lower(trim({t})), '\\s+', ' ', 'g'), ' ')"
)
WINNOW_GRAMS_SQL = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(generate_series(1, len(toks) - 2), "
    "i -> ('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 15))::BIGINT) "
    "ELSE [('0x' || substr(md5(array_to_string(toks, ' ')), 1, 15))::BIGINT] END"
)
#: note: no list_distinct here — DuckDB can't list_distinct structs
#: (histogram unimplemented); the oracle dedupes with SELECT DISTINCT
#: after unnest, which is equivalent to Spark's array_distinct + explode.
WINNOW_PAIRS_SQL = (
    "(list_transform("
    "generate_series(1, len(grams) - least(len(grams), 4) + 1), "
    "j -> {"
    "'pos': j + least(len(grams), 4) "
    "- list_position(list_reverse(grams[j:j+least(len(grams), 4)-1]), "
    "list_min(grams[j:j+least(len(grams), 4)-1])), "
    "'fp': list_min(grams[j:j+least(len(grams), 4)-1])"
    "}))"
)

# -- language identification (n-gram heuristic) ------------------------------

#: marker character-sequences per language; score = occurrence count.
#: A real system swaps in trained n-gram profiles; the *operator shape*
#: (vectorized marker counting + argmax) is what matters at scale.
_LANG_MARKERS = {
    "en": ["the ", " th"],
    "de": ["ch", " der "],
    "fr": [" le ", " et "],
    "es": [" el ", " os "],
}


def _occurrences(t: Column, pat: str) -> Column:
    return (F.length(t) - F.length(F.replace(t, F.lit(pat), F.lit("")))) / len(pat)


def lang_id(text: str | Column) -> Column:
    """Language-ID heuristic: CJK codepoints → zh; else argmax of marker
    counts with fixed priority tiebreak (en>de>fr>es); floor 'und' when no
    marker fires. Deterministic and mirrored in LANG_ID_SQL."""
    t = F.lower(_c(text))
    scores = {
        lang: sum([_occurrences(t, p) for p in pats], F.lit(0.0))
        for lang, pats in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.when(t.rlike("[一-鿿]"), F.lit("zh"))
    out = out.when(best <= 0, F.lit("und"))
    for lang in ["en", "de", "fr", "es"]:  # fixed priority
        out = out.when(scores[lang] == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


def _occ_sql(pat: str) -> str:
    esc = pat.replace("'", "''")
    return f"((length(lt) - length(replace(lt, '{esc}', ''))) / {len(pat)})"


_SCORE_SQL = {
    lang: " + ".join(_occ_sql(p) for p in pats)
    for lang, pats in _LANG_MARKERS.items()
}

LANG_ID_SQL = (
    "CASE WHEN regexp_matches(lt, '[\\x{4e00}-\\x{9fff}]') THEN 'zh' "
    "WHEN greatest(" + ", ".join(f"({s})" for s in _SCORE_SQL.values()) + ") <= 0 THEN 'und' "
    + " ".join(
        f"WHEN ({_SCORE_SQL[lang]}) = greatest("
        + ", ".join(f"({s})" for s in _SCORE_SQL.values())
        + f") THEN '{lang}'"
        for lang in ["en", "de", "fr", "es"]
    )
    + " ELSE 'und' END"
)


# -- URL canonicalization (C4 / RefinedWeb crawl-curation recipes) -----------
#
# Web-corpus pipelines dedup and filter by URL before ever touching text
# (RefinedWeb: "url deduplication and filtering"; C4: per-URL page keep).
# That needs a canonical form — crawls see the same page as
# http://Example.COM/a?utm_source=feed#top and https://example.com/a.
# Engine-portable regex chain (valid and identical in Java regex and
# RE2): no lookaround, no backreferences.

#: tracking query parameters stripped during canonicalization
_TRACKING_PARAMS = r"(utm_[^=&]*|fbclid|gclid|msclkid|ref_src)"
#: scheme://host prefix (scheme per RFC 3986: ALPHA *(ALPHA/DIGIT/+/-/.))
_SCHEME_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def canonical_url(url: str | Column) -> Column:
    """Canonicalize a URL for dedup/filtering:

    1. drop the fragment (``#…``),
    2. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
       ``msclkid``, ``ref_src``) wherever they sit in the query string,
    3. lowercase the scheme and host (path/query stay case-sensitive),
    4. drop a trailing ``/`` and a dangling ``?``.

    Pure ``regexp_replace``/``regexp_extract`` chain — whole-stage
    codegen, zero Python, and the exact same regexes run in the DuckDB
    oracle (CANONICAL_URL_SQL)."""
    u = _c(url)
    u = F.regexp_replace(u, r"#.*", "")                       # 1
    u = F.regexp_replace(u, rf"&{_TRACKING_PARAMS}=[^&]*", "")    # 2: not-first
    u = F.regexp_replace(u, rf"\?{_TRACKING_PARAMS}=[^&]*&", "?")  # 2: first
    u = F.regexp_replace(u, rf"\?{_TRACKING_PARAMS}=[^&]*$", "")   # 2: only
    u = F.concat(                                             # 3
        F.lower(F.regexp_extract(u, f"({_SCHEME_HOST})", 1)),
        F.regexp_replace(u, _SCHEME_HOST, ""),
    )
    u = F.regexp_replace(u, r"/$", "")                        # 4
    u = F.regexp_replace(u, r"\?$", "")
    return u


def _canonical_url_sql(u: str) -> str:
    """DuckDB twin of canonical_url over SQL expression ``u`` (a
    function, not a .format template — regex braces would collide with
    str.format). DuckDB regexp_replace needs the explicit 'g' flag for
    the multi-occurrence tracking-param pass."""
    s = f"regexp_replace({u}, '#.*', '')"
    s = f"regexp_replace({s}, '&{_TRACKING_PARAMS}=[^&]*', '', 'g')"
    s = f"regexp_replace({s}, '\\?{_TRACKING_PARAMS}=[^&]*&', '?')"
    s = f"regexp_replace({s}, '\\?{_TRACKING_PARAMS}=[^&]*$', '')"
    s = (
        f"lower(regexp_extract({s}, '({_SCHEME_HOST})', 1)) || "
        f"regexp_replace({s}, '{_SCHEME_HOST}', '')"
    )
    s = f"regexp_replace({s}, '/$', '')"
    s = f"regexp_replace({s}, '\\?$', '')"
    return s


CANONICAL_URL_SQL = _canonical_url_sql


def url_host(url: str | Column) -> Column:
    """Lowercased host (authority minus userinfo/port) — the join key
    for domain blocklists, per-domain caps and URL-level dedup."""
    return F.lower(
        F.regexp_extract(
            _c(url),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)",
            1,
        )
    )


def url_host_sql(u: str) -> str:
    """DuckDB twin of url_host. RE2 supports the same non-capturing
    userinfo group."""
    return (
        f"lower(regexp_extract({u}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1))"
    )
