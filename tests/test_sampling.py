"""Sampling operator properties (ext_sample_split / ext_sample_quota).

Oracle parity at sf0.01 runs in test_oracle_parity; these check the semantic
guarantees that make the operators *pipeline-safe*:

- the split is a pure function of the key (re-runs and subsets agree),
- split fractions approximate the 80/10/10 design,
- the two-phase (salted) quota top-K is EXACTLY the naive one-window top-K,
- quotas bind per group.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
    QUOTA_PER_LANG,
    _key_hash,
    ext_sample_quota,
    split_assignment,
)

SF = "/root/testdata/sf0.01"


def test_split_deterministic_and_subset_invariant(spark):
    docs = tables.load(spark, SF, "documents")
    full = {
        r.doc_id: r.split
        for r in docs.select("doc_id", split_assignment("doc_id").alias("split")).collect()
    }
    again = {
        r.doc_id: r.split
        for r in docs.select("doc_id", split_assignment("doc_id").alias("split")).collect()
    }
    assert full == again
    # subset invariance: filtering the input must not move any document's
    # split (this is the property rand()-based splits violate)
    sub = {
        r.doc_id: r.split
        for r in docs.where(F.col("doc_id") % 3 == 0)
        .select("doc_id", split_assignment("doc_id").alias("split"))
        .collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_split_fractions(spark):
    docs = tables.load(spark, SF, "documents")
    counts = dict(
        docs.select(split_assignment("doc_id").alias("split"))
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    # md5 is uniform; at n=500 allow generous tolerance around 80/10/10
    assert 0.70 <= counts["train"] / n <= 0.90
    assert 0.04 <= counts["val"] / n <= 0.16
    assert 0.04 <= counts["test"] / n <= 0.16


def test_two_phase_quota_equals_naive_window(spark):
    docs = tables.load(spark, SF, "documents")
    naive_w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    naive = (
        docs.select("doc_id", "lang", _key_hash("doc_id").alias("priority"))
        .withColumn("rank", F.row_number().over(naive_w))
        .where(F.col("rank") <= QUOTA_PER_LANG)
        .select("lang", "rank", "doc_id", "priority")
    )
    two_phase = ext_sample_quota(spark, SF)
    assert sorted(map(tuple, two_phase.collect())) == sorted(map(tuple, naive.collect()))


def _bucket(doc_id: int) -> int:
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def test_decontaminate_flags_copied_eval_doc(spark, tmp_path):
    """A test-split doc copying a train doc's text is flagged at ratio 1.0; a
    unique test doc is not flagged."""
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        TRAIN_PCT,
        VAL_PCT,
        ext_decontaminate,
    )

    train_id = next(i for i in range(1000) if _bucket(i) < TRAIN_PCT)
    test_ids = [i for i in range(1000) if _bucket(i) >= TRAIN_PCT + VAL_PCT]
    copied, unique = test_ids[0], test_ids[1]
    leaked = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (train_id, leaked, "en", "src", len(leaked)),
        (copied, leaked, "en", "src", len(leaked)),
        (unique, "one two three four five six seven", "en", "src", 33),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = {r.doc_id: r for r in ext_decontaminate(spark, str(tmp_path)).collect()}
    assert copied in out and out[copied].overlap_ratio == 1.0
    assert out[copied].split == "test"
    assert unique not in out
    assert train_id not in out  # train side is never flagged


def test_mixture_weights_normalize_and_upsample_small(spark):
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        ext_sample_mixture,
    )

    rows = ext_sample_mixture(spark, SF).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # α<1 ⇒ smaller sources get MORE than proportional share: effective
    # epochs must be anti-monotone in token mass across the extremes
    by_mass = sorted(rows, key=lambda r: r.n_tokens)
    assert by_mass[0].effective_epochs >= by_mass[-1].effective_epochs


def test_chunks_reassemble_to_documents(spark):
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        CHUNK_TOKENS,
        ext_sample_chunks,
    )
    from boletia_kubernetes_kafka_mongodb_spark.operators.text import tokens_col

    docs = tables.load(spark, SF, "documents")
    expected = {
        r.doc_id: r.joined
        for r in docs.select(
            "doc_id", F.array_join(tokens_col("text"), " ").alias("joined")
        ).collect()
        if r.joined
    }
    chunks = ext_sample_chunks(spark, SF).collect()
    got: dict[int, list] = {}
    for c in chunks:
        got.setdefault(c.doc_id, []).append(c)
        assert 1 <= c.chunk_tokens <= CHUNK_TOKENS
    reassembled = {
        k: " ".join(c.chunk_text for c in sorted(v, key=lambda c: c.chunk_idx))
        for k, v in got.items()
    }
    assert reassembled == expected
    # only the final chunk of a doc may be short
    for v in got.values():
        for c in sorted(v, key=lambda c: c.chunk_idx)[:-1]:
            assert c.chunk_tokens == CHUNK_TOKENS


def test_sampling_plan_gates(spark):
    """The scale claims, mechanically: chunking never shuffles; the split
    summary's only exchange is the 3-group aggregate; quota reads only the
    columns it needs (never ``text``)."""
    from boletia_kubernetes_kafka_mongodb_spark import plans
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        ext_sample_chunks,
        ext_sample_quota,
        ext_sample_split,
    )

    # note: tables.load(fan=True) inserts one round-robin repartition at
    # this (tiny) SF — that exchange is allowed; at real scale file splits
    # provide the parallelism and it disappears
    import re

    def n_exchanges(df):
        # formatted explain names each node twice (tree + details) — count
        # the "(n) Exchange" detail headers once per physical node
        return len(re.findall(r"\(\d+\) Exchange", plans.explain_str(df)))

    plan = plans.explain_str(ext_sample_chunks(spark, SF))
    assert n_exchanges(ext_sample_chunks(spark, SF)) <= 1  # fan-out repartition only
    assert "SortMergeJoin" not in plan

    split_plan = plans.explain_str(ext_sample_split(spark, SF))
    # fan repartition + one agg exchange, nothing else (no join, no sort)
    assert n_exchanges(ext_sample_split(spark, SF)) <= 2
    assert "SortMergeJoin" not in split_plan and "BroadcastHashJoin" not in split_plan

    quota = ext_sample_quota(spark, SF)
    assert "text" not in plans.read_schema_columns(quota)


def test_quota_binds_per_group(spark):
    out = ext_sample_quota(spark, SF)
    per_lang = dict(
        out.groupBy("lang").count().rdd.map(lambda r: (r["lang"], r["count"])).collect()
    )
    assert per_lang  # non-empty
    assert all(c <= QUOTA_PER_LANG for c in per_lang.values())
    # ranks are dense 1..K within each group
    ranks = out.groupBy("lang").agg(
        F.min("rank").alias("lo"), F.max("rank").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    for r in ranks.collect():
        assert r.lo == 1 and r.hi == r.n


def test_pack_capacity_invariant(spark):
    """Every pack holds <= capacity + its largest doc (straddle bound), ids
    are contiguous per source from 0, and offsets increase within a pack."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import sampling as S

    rows = S.ext_sample_pack(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    per_pack = {}
    for r in rows:
        per_pack.setdefault((r.source, r.pack_id), []).append(r)
    for (_, pid), members in per_pack.items():
        total = sum(m.n_tokens for m in members)
        assert total <= S.PACK_TOKENS + max(m.n_tokens for m in members)
        offs = [m.pack_offset for m in sorted(members, key=lambda m: m.doc_id)]
        assert offs == sorted(offs)
    for source in {r.source for r in rows}:
        pids = sorted({r.pack_id for r in rows if r.source == source})
        assert pids == list(range(len(pids)))  # contiguous from 0


def test_keep_list_covers_corpus_with_consistent_verdicts(spark):
    """The decision layer is a partition of the corpus: one row per doc,
    keep ⟺ (train ∧ survivor ∧ not-boilerplate ∧ quality), drop_reason iff
    not keep, and contamination only ever flags held-out docs."""
    from boletia_kubernetes_kafka_mongodb_spark import tables
    from boletia_kubernetes_kafka_mongodb_spark.operators import sampling
    from tests.conftest import SF_SMOKE

    out = sampling.ext_corpus_keep_list(spark, SF_SMOKE)
    rows = out.collect()
    n = tables.load(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n and len({r.doc_id for r in rows}) == n
    assert any(r.keep for r in rows) and any(not r.keep for r in rows)
    saw_boilerplate = False
    for r in rows:
        assert r.keep == (
            r.split == "train"
            and r.is_survivor
            and r.boilerplate_ok
            and r.quality_ok
        )
        assert (r.drop_reason is None) == r.keep
        if r.contaminated:
            assert r.split != "train"
        if r.split != "train":
            assert r.drop_reason == "held_out"
        if r.drop_reason == "boilerplate":
            saw_boilerplate = True
            assert r.is_survivor and not r.boilerplate_ok
    # the stage must actually fire: unique-but-assembled docs exist at sf0.01
    assert saw_boilerplate


def test_split_drift_nonnegative_and_zero_on_identical(spark, tmp_path):
    """KL ≥ 0 always; identical train/val token distributions → KL ≈ 0
    (up to the smoothing asymmetry from unequal split masses)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        TRAIN_PCT,
        VAL_PCT,
        ext_split_drift,
    )

    rows_real = ext_split_drift(spark, SF).collect()
    assert rows_real, "drift query returned nothing"
    for r in rows_real:
        assert r.kl_train_val >= 0.0
        assert r.vocab > 0

    # crafted: every doc identical text → p_train == p_val exactly
    train_ids = [i for i in range(400) if _bucket(i) < TRAIN_PCT][:20]
    val_ids = [
        i for i in range(400) if TRAIN_PCT <= _bucket(i) < TRAIN_PCT + VAL_PCT
    ][:20]
    text = "same words every time"
    rows = [(i, text, "en", "src", len(text)) for i in train_ids + val_ids]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = ext_split_drift(spark, str(tmp_path)).collect()
    assert len(out) == 1 and abs(out[0].kl_train_val) < 1e-6


def test_bloom_decontaminate_supersets_exact_hits(spark):
    """Bloom has NO false negatives: every train doc sharing a distinct
    shingle with the eval side must be flagged; extra flags (false
    positives) are allowed and must stay a small fraction."""
    from boletia_kubernetes_kafka_mongodb_spark.operators.dedup import _shingles
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        ext_decontaminate_bloom,
        split_assignment,
    )
    from boletia_kubernetes_kafka_mongodb_spark.operators.text import tokens_col

    docs = tables.load(spark, SF, "documents")
    sh = docs.select(
        "doc_id",
        split_assignment("doc_id").alias("split"),
        F.explode(F.array_distinct(_shingles(tokens_col("text")))).alias("shingle"),
    )
    eval_sh = sh.where(F.col("split") != "train").select("shingle").distinct()
    exact_hits = {
        r.doc_id
        for r in sh.where(F.col("split") == "train")
        .join(eval_sh, "shingle")
        .select("doc_id")
        .distinct()
        .collect()
    }

    out = ext_decontaminate_bloom(spark, SF).collect()
    flagged = {r.doc_id for r in out if r.contaminated}
    assert exact_hits.issubset(flagged)
    # false-positive head-room: flagged-but-not-exact docs exist only via
    # bloom collisions; with m=2^16/k=3 they must stay well under 20%
    n_train = len(out)
    assert len(flagged - exact_hits) <= max(2, 0.2 * n_train)


def test_weighted_sample_matches_python_reference(spark):
    """The A-Res selection is exactly reproducible from the raw table."""
    import math

    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        WEIGHTED_SAMPLE_K,
        ext_sample_weighted,
    )

    docs = tables.load(spark, SF, "documents").select("doc_id", "n_chars").collect()
    import hashlib

    def h32(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    ranked = sorted(
        (
            (-math.log((h32(r.doc_id) + 0.5) / 2**32) / max(r.n_chars, 1), r.doc_id)
            for r in docs
        )
    )
    expect = [doc_id for _, doc_id in ranked[:WEIGHTED_SAMPLE_K]]

    got = ext_sample_weighted(spark, SF).collect()
    assert [r.doc_id for r in got] == expect
    assert all(r.priority > 0 for r in got)


def test_importance_prefers_target_domain_tokens(spark, tmp_path):
    """A doc made of target-domain tokens must outscore a doc of
    general-only tokens, and the target corpus itself scores positive."""
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        ext_sample_importance,
    )

    rows = [
        (0, "apple apple banana", "en", "src0", 1),   # target slice
        (1, "apple banana apple", "en", "src0", 1),
        (2, "zebra yak zebra yak", "en", "src1", 1),  # general-only noise
        (3, "apple banana", "en", "src1", 1),         # target-like outsider
        (4, "zebra yak", "en", "src1", 1),            # noise-like outsider
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = {r.doc_id: r for r in ext_sample_importance(spark, str(tmp_path)).collect()}
    assert out[3].importance > out[4].importance
    assert out[0].importance > 0
    assert out[4].importance < 0
    assert out[3].n_tokens == 2


def test_split_leakage_safe_guarantee_and_moved_semantics(spark):
    """Every near-dup component lands in exactly ONE split (the leakage
    guarantee — the whole point of the operator), singleton docs never
    move relative to the naive doc-keyed split, and the moved flag is
    exactly 'component hash relocated this doc'."""
    import hashlib as hl

    from tests.conftest import SF_CORRECT as SF

    from boletia_kubernetes_kafka_mongodb_spark.operators import sampling

    rows = sampling.ext_split_leakage_safe(spark, SF).collect()
    assert len(rows) > 0

    def py_split(key: int) -> str:
        b = int(hl.md5(str(key).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    comps = {}
    for r in rows:
        comps.setdefault(r.component, []).append(r)
    assert any(len(v) > 1 for v in comps.values()), "fixture has no clusters"
    for comp, members in comps.items():
        assert len({m.split for m in members}) == 1, f"component {comp} straddles"
        for m in members:
            assert m.split == py_split(comp)
            assert m.moved == (py_split(comp) != py_split(m.doc_id))
            if len(members) == 1 and comp == m.doc_id:
                assert not m.moved
    # the fix must be observable on this fixture: the naive split WOULD
    # have leaked (some multi-doc component straddles doc-keyed splits)
    assert any(
        len({py_split(m.doc_id) for m in v}) > 1
        for v in comps.values() if len(v) > 1
    )


def test_budget_select_tier_decomposition_equals_naive(spark):
    """The tier-decomposed plan (whole tiers admitted from a 5-row agg,
    window only inside tiers) must reproduce the naive global rule
    exactly — crafted fixture exercises a WHOLE admitted tier, a
    straddling boundary tier, and fully-excluded tiers."""
    import re as re_mod
    from unittest import mock

    from boletia_kubernetes_kafka_mongodb_spark.operators import sampling

    mk = lambda n, stop: (  # noqa: E731
        ("the " if stop else "zzz ") + " ".join(f"w{i}" for i in range(n))
    )
    rows = [
        # tier 1.0: len >= 50, stopword, clean  (doc_ids deliberately
        # interleaved across tiers so ordering is by tier THEN doc_id)
        (10, mk(20, True)), (3, mk(30, True)),
        # tier 0.75: clean + long but NO stopword
        (7, mk(25, False)), (1, mk(25, False)), (12, mk(25, False)),
        # tier 0.25: short, clean, no stopword
        (5, "zz yy"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def tokens(t):
        return len(re_mod.findall(r"[a-z0-9]+", t.lower()))

    def quality(t):
        q = 0.0
        if 50 <= len(t) <= 100_000:
            q += 0.5
        if "the" in re_mod.findall(r"[a-z0-9]+", t.lower()):
            q += 0.25
        punct = len(re_mod.sub(r"[a-zA-Z0-9 ]", "", t))
        if punct / max(len(t), 1) < 0.1:
            q += 0.25
        return q

    naive = sorted(
        ((quality(t), d, tokens(t)) for d, t in rows),
        key=lambda x: (-x[0], x[1]),
    )
    # budget: all of tier 1.0 + the first two boundary-tier docs
    budget = sum(t for _, _, t in naive[:4])
    expected, cum = [], 0
    for rank, (q, d, t) in enumerate(naive, 1):
        cum += t
        if cum <= budget:
            expected.append((rank, d, q, t, cum))

    with mock.patch.object(sampling.tables, "load", return_value=docs), \
         mock.patch.object(sampling, "TOKEN_BUDGET", budget):
        got = sorted(
            tuple(r) for r in sampling.ext_corpus_budget_select(spark, "x").collect()
        )
    assert got == sorted(expected)
    # both decomposition branches really ran: an admitted doc from a tier
    # that fits whole AND one from the straddling tier
    qs = {q for _, _, q, _, _ in got}
    assert 1.0 in qs and 0.75 in qs
    assert len(got) == 4 and all(c <= budget for *_, c in got)
