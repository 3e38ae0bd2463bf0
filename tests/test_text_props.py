"""Property-based tests for the text-analysis surface (hypothesis) —
the upgrade over the reference's table-driven-only tests (SURVEY.md §5.2.7).
Spark-free: the properties constrain the SHARED semantics (the same
expressions run JVM-side and in the DuckDB oracle), so we check the
pure-Python equivalents of each contract."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from bmspark.functions.dedup import simhash_of_tokens
from bmspark.oracle_extract import extract

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_fingerprint_whitespace_invariance(t):
    """fingerprint(x) is invariant under leading/trailing/extra internal
    whitespace — the normalization contract both engines implement."""
    def fp(s):
        norm = re.sub(r"\s+", " ", s.strip().lower())
        return hashlib.md5(norm.encode()).hexdigest()

    assert fp(t) == fp("  " + t + "\t") == fp(t.replace(" ", "  "))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), max_size=60))
def test_simhash_deterministic_and_order_insensitive_for_bags(toks):
    """SimHash depends on the token BAG, not order (sign-sum commutes)."""
    assert simhash_of_tokens(toks) == simhash_of_tokens(list(reversed(toks)))
    s = simhash_of_tokens(toks)
    assert -(1 << 63) <= s < (1 << 63)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=40))
def test_simhash_single_token_change_small_hamming(toks):
    """Changing one token flips few bits relative to a disjoint rewrite."""
    a = simhash_of_tokens(toks)
    b = simhash_of_tokens(toks + ["zzz_novel_token"])
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham <= 64  # sanity; near-dup property asserted statistically below


def test_simhash_near_vs_far_separation():
    base = [f"tok{i}" for i in range(60)]
    near = base.copy(); near[5] = "CHANGED"
    far = [f"other{i}" for i in range(60)]
    h = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")  # noqa: E731
    a, n, f = (simhash_of_tokens(t) for t in (base, near, far))
    assert h(a, n) < h(a, f), (h(a, n), h(a, f))
    assert h(a, n) <= 10


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=1024))
def test_extract_never_lossy_on_text_bytes(payload):
    """Whatever bytes went between <p>…</p> come back bit-exact."""
    html = b"<html><body><p>" + payload.replace(b"</p>", b"") + b"</p></body></html>"
    r = extract(html)
    assert r["text_bytes"] == payload.replace(b"</p>", b"")
