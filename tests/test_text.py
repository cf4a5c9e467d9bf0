"""Winnowing fingerprint properties (ext_text_winnowing).

The oracle-parity test (test_oracle_parity) checks exact value equality with
DuckDB at sf0.01; these tests check the *semantic guarantees* on crafted
inputs: the winnowing containment property, edge-length behavior, and
agreement with the python reference model.
"""

from __future__ import annotations

from boletia_kubernetes_kafka_mongodb_spark.operators.text import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_fingerprints_py,
)

GUARANTEE_LEN = WINNOW_K + WINNOW_W - 1  # shared substring ⇒ shared fingerprint


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = winnow_fingerprints(df).collect()
    return {r.doc_id: (r.n_grams, list(r.fingerprints)) for r in out}


def test_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",
        "",
        "aaaaaaaaaaaaaaaaaaaa",
        "Punctuation, CASE and   spaces are normalized AWAY!",
        "exactly8",  # len == K after normalization → one gram
        "exactly8ch",  # K ≤ grams < W
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == winnow_fingerprints_py(t), f"doc {i}: {t!r}"


def test_shared_substring_shares_fingerprint(spark):
    # winnowing guarantee: a shared normalized substring of length
    # ≥ K+W−1 yields at least one common selected fingerprint
    shared = "abcdefghijk"[:GUARANTEE_LEN]
    assert len(shared) == GUARANTEE_LEN
    a = f"totally unrelated prefix {shared} and some suffix here"
    b = f"{shared} opens this other document with different content"
    got = _run(spark, [a, b])
    fps_a, fps_b = set(got[0][1]), set(got[1][1])
    assert fps_a & fps_b, "winnowing guarantee violated"


def test_edge_lengths(spark):
    got = _run(spark, ["", "ab", "x" * (WINNOW_K - 1), "y" * WINNOW_K])
    assert got[0] == (0, [])
    assert got[1] == (0, [])
    assert got[2] == (0, [])
    n_grams, fps = got[3]
    assert n_grams == 1 and len(fps) == 1


def test_identical_docs_identical_fingerprints(spark):
    t = "some reasonably long document text that will produce fingerprints"
    got = _run(spark, [t, t])
    assert got[0] == got[1]
    assert got[0][1], "expected non-empty fingerprint set"
