"""Stream ≡ batch parity for the corpus-pipeline streaming twins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark import tables
from boletia_kubernetes_kafka_mongodb_spark.operators import dedup
from boletia_kubernetes_kafka_mongodb_spark.sources import cdc_stream
from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus
from tests.conftest import SF_SMOKE


def _doc_stream(spark, tmp_path, n_files=4):
    """documents written as doc_id-ordered files → micro-batched stream."""
    docs = tables.load(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs")
    cdc_stream.write_ordered_files(docs, path, n_files=n_files, order_col="doc_id")
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_vocab_counts_stream_equals_batch(spark, tmp_path):
    stream = _doc_stream(spark, tmp_path)
    q = (
        corpus.vocab_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("vocab_counts_tw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = sorted(
        map(tuple, spark.table("vocab_counts_tw").collect())
    )
    docs = tables.load(spark, SF_SMOKE, "documents")
    from boletia_kubernetes_kafka_mongodb_spark.operators.text import tokens_col

    want = sorted(
        map(
            tuple,
            docs.select("lang", F.explode(tokens_col("text")).alias("token"))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_dedup_exact_stream_survivors_equal_batch(spark, tmp_path):
    """Keep-first streaming dedup over doc_id-ordered arrival == the batch
    min-doc_id survivor set, and the stream's output cardinality is the
    number of distinct fingerprints."""
    stream = _doc_stream(spark, tmp_path)
    q = (
        corpus.dedup_exact_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_exact_tw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    out = spark.table("dedup_exact_tw")
    got = {(r.fingerprint, r.doc_id) for r in out.collect()}
    want = {
        (r.fingerprint, r.survivor_doc_id)
        for r in dedup.ext_dedup_exact(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_dedup_incremental_stream_equals_batch(spark, tmp_path):
    """Stream-static join twin: streaming the new batch against the standing
    fingerprint index yields exactly the batch operator's verdicts."""
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        split_assignment,
    )

    docs = tables.load(spark, SF_SMOKE, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    tagged = docs.select(
        "doc_id", "text", split_assignment("doc_id").alias("split"), fp.alias("fp")
    )
    standing = (
        tagged.where(F.col("split") != "test")
        .groupBy(F.col("fp").alias("fingerprint"))
        .agg(F.min("doc_id").cast("long").alias("dup_of"))
    )
    new_docs = tagged.where(F.col("split") == "test").select("doc_id", "text")
    path = str(tmp_path / "newdocs")
    cdc_stream.write_ordered_files(new_docs, path, n_files=3, order_col="doc_id")
    stream = (
        spark.readStream.schema(new_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        corpus.dedup_incremental_stream(stream, standing)
        .writeStream.format("memory")
        .queryName("dedup_incr_tw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = sorted(map(tuple, spark.table("dedup_incr_tw").collect()))
    want = sorted(
        map(tuple, dedup.ext_dedup_incremental(spark, SF_SMOKE).collect())
    )
    assert got == want and len(got) > 0


def test_funnel_stream_equals_batch_reach(spark, tmp_path):
    """Per-user funnel reach from the stateful stream == a sequential fold
    over (ts, event_id)-ordered events — i.e. the batch window semantics."""
    from boletia_kubernetes_kafka_mongodb_spark.streaming.windows import (
        funnel_stream,
    )

    ev = tables.load(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    path = str(tmp_path / "events")
    cdc_stream.write_ordered_files(ev, path, n_files=4, order_col="ts")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_tw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        r.user_id: (r.r1, r.r2, r.r3)
        for r in spark.table("funnel_tw")
        .groupBy("user_id")
        .agg(F.max("r1").alias("r1"), F.max("r2").alias("r2"), F.max("r3").alias("r3"))
        .collect()
    }

    want = {}
    for r in sorted(ev.collect(), key=lambda r: (r.ts, r.event_id)):
        sv, qc, p3 = want.get(r.user_id, (False, False, False))
        if r.event_type == "view":
            sv = True
        elif r.event_type == "click" and sv:
            qc = True
        elif r.event_type == "purchase" and qc:
            p3 = True
        want[r.user_id] = (sv, qc, p3)
    assert got == want and len(got) > 0

    # and the stage totals equal the batch operator's counts
    from boletia_kubernetes_kafka_mongodb_spark.operators.aggregates import (
        agg_funnel_stages,
    )

    batch = {r.stage: r.n_users for r in agg_funnel_stages(spark, SF_SMOKE).collect()}
    assert batch[1] == sum(1 for v in got.values() if v[0])
    assert batch[2] == sum(1 for v in got.values() if v[1])
    assert batch[3] == sum(1 for v in got.values() if v[2])


def test_percolate_stream_equals_batch(spark, tmp_path):
    """Replayed streaming percolation == the batch operator (stream-static
    broadcast match, zero stream state)."""
    from boletia_kubernetes_kafka_mongodb_spark import tables
    from boletia_kubernetes_kafka_mongodb_spark.operators import search
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as sc

    docs = tables.load(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs")
    docs.coalesce(2).write.parquet(path)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    q = (
        sc.percolate_stream(stream, search._percolate_frame(spark))
        .writeStream.format("memory")
        .queryName("perc_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_perc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.doc_id, r.query_id): r.n_hits
        for r in spark.sql("select * from perc_out").collect()
    }
    expect = {
        (r.doc_id, r.query_id): r.n_hits
        for r in search.ext_percolate_match(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_quality_score_stream_equals_batch(spark, tmp_path):
    """Train on the batch snapshot, serve the SAME documents as a file
    stream: per-doc scores and predictions are identical to the batch
    operator's output."""
    from boletia_kubernetes_kafka_mongodb_spark import tables
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    sf = "/root/testdata/sf0.001"
    docs = tables.load(spark, sf, "documents")
    batch = {r.doc_id: (r.score, r.pred) for r in T.ext_quality_classifier(spark, sf).collect()}

    feats = T._qc_features(docs).localCheckpoint(eager=True)
    w = T.quality_classifier_fit(feats, feats.count())

    src = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    (
        C.quality_score_stream(stream, w)
        .writeStream.format("memory").queryName("qscores")
        .trigger(availableNow=True).start().awaitTermination(120)
    )
    got = {
        r.doc_id: (r.score, r.pred)
        for r in spark.sql("SELECT * FROM qscores").collect()
    }
    assert got == batch


def test_quality_gate_stream_equals_batch_threshold(spark, tmp_path):
    """The full offline→online operating-point loop: fit + choose a
    threshold on the batch snapshot (`quality_threshold_select`), gate
    the SAME documents as a file stream — the streamed keep set equals
    the batch rule `score >= t` exactly (integer-unit compare, never a
    float-epsilon different decision)."""
    from boletia_kubernetes_kafka_mongodb_spark import tables
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    sf = "/root/testdata/sf0.001"
    docs = tables.load(spark, sf, "documents")
    feats = T._qc_features(docs).localCheckpoint(eager=True)
    n = feats.count()
    w = T.quality_classifier_fit(feats, n)
    scored = T.quality_classifier_score(feats, w)
    ops = {r.target: r for r in T.quality_threshold_select(spark, scored, total=n).collect()}
    # pick the loosest attainable operating point; fall back to 0.5 if
    # the fixture attains none (threshold rows are NULL then)
    chosen = next(
        (r.threshold for t, r in sorted(ops.items()) if r.threshold is not None),
        0.5,
    )
    batch_keep = {
        r.doc_id: round(r.score * 1_000_000) >= round(chosen * 1_000_000)
        for r in scored.collect()
    }

    src = str(tmp_path / "gate_stream")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    (
        C.quality_gate_stream(stream, w, chosen)
        .writeStream.format("memory").queryName("qgate")
        .trigger(availableNow=True).start().awaitTermination(120)
    )
    rows = spark.sql("SELECT * FROM qgate").collect()
    assert {r.doc_id: r.keep for r in rows} == batch_keep
    assert any(r.keep for r in rows) or all(not v for v in batch_keep.values())


def test_ingestion_pipeline_end_to_end_stream(spark, tmp_path):
    """The composed ingestion story in ONE streaming query: CSV shards
    land → format quarantine → learned quality gate (offline fit +
    offline operating point) → stateful keep-first exact dedup → sink.
    Checks: corrupt lines reach quarantine (never the pipeline), the
    gate's keep set matches the batch rule, and exactly one survivor per
    normalized-text fingerprint among gate-kept docs comes out."""
    from pyspark.sql import functions as F

    from boletia_kubernetes_kafka_mongodb_spark import tables
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.sources import csv_corpus
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    sf = "/root/testdata/sf0.001"
    docs = tables.load(spark, sf, "documents")

    # offline: fit + pick the loosest attainable operating point
    feats = T._qc_features(docs).localCheckpoint(eager=True)
    n = feats.count()
    w = T.quality_classifier_fit(feats, n)
    scored = T.quality_classifier_score(feats, w)
    ops = T.quality_threshold_select(spark, scored, total=n).collect()
    chosen = next(
        (r.threshold for r in sorted(ops, key=lambda r: r.target)
         if r.threshold is not None),
        0.5,
    )

    # shard directory: the corpus as CSV + an exact-duplicate line of the
    # max-id doc (new id 999999) + two corrupt lines
    src = tmp_path / "landing"
    src.mkdir()
    csv_corpus.write_csv_corpus(docs, str(src / "shard-0"))
    dup = docs.orderBy(F.desc("doc_id")).first()
    (src / "shard-1.csv").write_text(
        spark.createDataFrame(
            [(999999, dup.text, dup.lang, dup.source, dup.n_chars)], docs.schema
        ).select(F.to_csv(F.struct(*docs.columns))).first()[0]
        + "\n"
        "zzz,not an id,en,s,5\n"
        "1,too,many,fields,5,6,EXTRA\n"
    )

    good, quarantine = csv_corpus.read_csv_corpus_stream(
        spark, str(src) + "/*"
    )
    gated = C.quality_gate_stream(good, w, chosen)
    kept = gated.where(F.col("keep")).drop("score", "keep")
    survivors = C.dedup_exact_stream(kept)
    (
        survivors.writeStream.format("memory").queryName("pipe_out")
        .trigger(availableNow=True).start().awaitTermination(180)
    )
    (
        quarantine.select("line").writeStream.format("memory")
        .queryName("pipe_quar").trigger(availableNow=True).start()
        .awaitTermination(120)
    )

    out = spark.sql("SELECT * FROM pipe_out").collect()
    quar = sorted(r.line for r in spark.sql("SELECT * FROM pipe_quar").collect())
    assert quar == ["1,too,many,fields,5,6,EXTRA", "zzz,not an id,en,s,5"]

    # batch expectation: gate-kept docs (the duplicate copy passes iff its
    # original does), one survivor per fingerprint
    tu = round(chosen * 1_000_000)
    batch_kept = {
        r.doc_id for r in scored.collect()
        if round(r.score * 1_000_000) >= tu
    }
    fp = {r.doc_id: r.fp for r in docs.select(
        "doc_id", T.fingerprint_col().alias("fp")).collect()}
    want_fps = {fp[d] for d in batch_kept}
    assert {r.fingerprint for r in out} == want_fps
    assert len(out) == len(want_fps), "more than one survivor per fingerprint"
    # every survivor is a gate-kept doc (999999 may stand in for the dup)
    legal = batch_kept | ({999999} if dup.doc_id in batch_kept else set())
    assert all(r.doc_id in legal for r in out)


def test_quality_psi_stream_equals_batch(spark, tmp_path):
    """The monitoring lambda: fit + per-bin baseline offline, stream the
    SAME documents in 4 micro-batches — each batch's streamed PSI row
    equals `quality_psi_batch` on that batch's rows (stateless, and the
    deterministic-ln algebra is shared, so the readings are identical,
    not merely close)."""
    from boletia_kubernetes_kafka_mongodb_spark import tables
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    sf = "/root/testdata/sf0.001"
    docs = tables.load(spark, sf, "documents")
    feats = T._qc_features(docs).localCheckpoint(eager=True)
    n = feats.count()
    w = T.quality_classifier_fit(feats, n)
    bin_col = F.least(
        F.floor(T.quality_score_col(w) * T.QC_CAL_BINS).cast("int"),
        F.lit(T.QC_CAL_BINS - 1),
    )
    fit_bin = (
        feats.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=True)
    )

    stream = _doc_stream(spark, tmp_path)
    got: dict[int, tuple] = {}

    def emit(psi_df):
        for r in psi_df.collect():
            got[r.batch_id] = (r.n, r.psi, r.drifted)

    q = (
        C.quality_psi_stream(stream, w, fit_bin, n, emit)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "psi_ckpt"))
        .start()
    )
    q.awaitTermination(300)
    assert len(got) == 4 and sum(v[0] for v in got.values()) == docs.count()
    # replay: the stream delivered doc_id-ordered files;
    # rebuild each micro-batch from the written files and compare exactly
    import glob

    files = sorted(glob.glob(str(tmp_path / "docs") + "/*.parquet"), key=os.path.getmtime)
    assert len(files) == 4
    psis = sorted((v[1], v[0]) for v in got.values())
    want = []
    for i, f in enumerate(files):
        bdf = spark.read.schema(docs.schema).parquet(f)
        r = C.quality_psi_batch(bdf, w, fit_bin, n, i).collect()[0]
        want.append((r.psi, r.n))
    assert psis == sorted(want)


def test_quantile_sketch_stream_state_equals_batch_sketch(spark, tmp_path):
    """The standing sketch after draining the stream is EXACTLY the batch
    whole-corpus sketch (bottom-K mergeability is exact, not approximate):
    same (event_type, h, event_id, value) row set, and the final served
    percentiles equal `ext_approx_quantiles_sketch` on the same events."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates as A
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    ev = tables.load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events")
    cdc_stream.write_ordered_files(ev, path, n_files=4, order_col="event_id")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    state: dict = {"sketch": None}
    emitted: dict[int, list] = {}

    def emit(bid, pct_df):
        emitted[bid] = sorted(map(tuple, pct_df.collect()))

    q = (
        C.quantile_sketch_stream(stream, emit, state)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "qsk_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    assert len(emitted) == 4

    got_rows = sorted(map(tuple, state["sketch"].collect()))
    want_rows = sorted(
        map(tuple, A._qsk_bottomk(A._qsk_partials(ev)).collect())
    )
    assert got_rows == want_rows and len(got_rows) > 0

    want_pcts = sorted(
        map(tuple, A.ext_approx_quantiles_sketch(spark, SF_SMOKE).collect())
    )
    assert emitted[max(emitted)] == want_pcts


def test_quantile_sketch_stream_percentiles_converge(spark, tmp_path):
    """Intermediate emissions are the sketch of the PREFIX: after batch 0
    the served percentiles equal the batch sketch over file-0 rows alone."""
    import glob

    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    ev = tables.load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events")
    cdc_stream.write_ordered_files(ev, path, n_files=3, order_col="event_id")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    emitted: dict[int, list] = {}

    def emit(bid, pct_df):
        emitted[bid] = sorted(map(tuple, pct_df.collect()))

    q = (
        C.quantile_sketch_stream(stream, emit)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "qsk2_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    files = sorted(glob.glob(path + "/*.parquet"), key=os.path.getmtime)
    first = spark.read.schema(ev.schema).parquet(files[0])
    want0 = sorted(
        map(
            tuple,
            C.quantile_sketch_serve(
                C.quantile_sketch_update(None, first)
            ).collect(),
        )
    )
    assert emitted[0] == want0


def test_heavy_hitters_stream_guarantees_vs_exact(spark, tmp_path):
    """Streaming MG with a deliberately tiny k over a skewed crafted corpus:
    after draining, (a) the running total is the exact token count, (b) the
    candidate set contains EVERY token with true frequency > N/(k+1) — the
    no-false-negative guarantee across merges — and (c) every estimate
    satisfies est ≤ true ≤ est + N/(k+1)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators.text import tokens_col
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    # skewed corpus: 'alpha' dominates, long tail of near-unique tokens
    rows = []
    for i in range(120):
        toks = ["alpha", "alpha", f"tail{i}"] + (["beta"] if i % 3 == 0 else [])
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "hhdocs")
    cdc_stream.write_ordered_files(docs, path, n_files=4, order_col="doc_id")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    k = 4
    seen: list = []

    def emit(bid, n_total, counters):
        seen.append((bid, n_total, counters))

    q = (
        C.heavy_hitters_stream(stream, emit, k=k)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    assert len(seen) == 4
    _, n_total, counters = seen[-1]

    exact = {
        r["token"]: r["n"]
        for r in docs.select(F.explode(tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    n = sum(exact.values())
    assert n_total == n
    heavy = {t for t, c in exact.items() if c * (k + 1) > n}
    assert heavy and heavy.issubset(set(counters)), (heavy, counters)
    assert len(counters) <= k
    for t, est in counters.items():
        true = exact.get(t, 0)
        assert est <= true <= est + n / (k + 1), (t, est, true, n)


def test_mg_merge_guarantee_crafted():
    """Unit: m-way counter-add + single truncation preserves the MG bound
    on a crafted pair of summaries whose merge forces a truncation."""
    from boletia_kubernetes_kafka_mongodb_spark.operators.text import mg_merge

    # exact stream A: a×6, b×4, c×1  → MG(2) summary {a:5, b:3} (c evicted)
    # exact stream B: c×5, d×3, a×1  → MG(2) summary {c:4, d:2} (a evicted)
    a = {"a": 5, "b": 3}
    b = {"c": 4, "d": 2}
    merged = mg_merge(a, b, 2)
    exact = {"a": 7, "b": 4, "c": 6, "d": 3}
    n = sum(exact.values())
    assert len(merged) <= 2
    for t, c in exact.items():
        if c > n / 3:  # true heavy at k=2
            assert t in merged
    for t, est in merged.items():
        assert est <= exact[t] <= est + n / 3


def test_freq_sketch_stream_state_equals_batch_cells(spark, tmp_path):
    """Streaming Count-Min: drained cell state == the batch cell table over
    the same documents (cell-wise SUM merge is exact), and estimates served
    from the drained state match the batch audit operator's estimates for
    its probe keys."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    docs = tables.load(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "cmsdocs")
    cdc_stream.write_ordered_files(docs, path, n_files=4, order_col="doc_id")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    state: dict = {"cells": None}
    n_emits = []

    q = (
        C.freq_sketch_stream(stream, lambda bid, cells: n_emits.append(bid), state=state)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    assert n_emits == [0, 1, 2, 3]

    toks = docs.select(F.explode(T.tokens_col("text")).alias("token"))
    want_cells = sorted(map(tuple, T._cms_cells(toks, T.CMS_D, T.CMS_W).collect()))
    got_cells = sorted(map(tuple, state["cells"].collect()))
    assert got_cells == want_cells and len(got_cells) > 0

    batch = T.ext_freq_countmin(spark, SF_SMOKE)
    keys = batch.select("token")
    got_est = {
        r.token: r.n_est
        for r in C.freq_sketch_estimate(state["cells"], keys).collect()
    }
    want_est = {r.token: r.n_est for r in batch.collect()}
    assert got_est == want_est


def test_freq_sketch_estimate_unseen_key_zero(spark):
    """A key never inserted can estimate 0 when one of its cells is empty —
    the absent-cell-is-zero rule (left join + per-row coalesce BEFORE min)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    toks = spark.createDataFrame([("only",)], "token string")
    # w large enough that a random other key almost surely misses at least
    # one of 'only's cells; assert the rule structurally instead: an empty
    # sketch estimates 0 for anything
    cells = T._cms_cells(toks, 2, 64).where(F.lit(False))
    got = C.freq_sketch_estimate(cells, spark.createDataFrame(
        [("ghost",)], "token string"), 2, 64).collect()
    assert len(got) == 1 and got[0].n_est == 0


def test_monitoring_stack_one_stream(spark, tmp_path):
    """The round-8 monitoring stack COMPOSED in one streaming query: a
    single foreachBatch drives the PSI drift reading (stateless, vs the
    offline fit baseline), the Misra–Gries heavy-hitter fold, and the
    Count-Min cell fold over the SAME arriving micro-batches — three
    bounded monitor states, one pipeline. Each monitor must honor its
    standalone contract: PSI readings equal the per-batch stateless
    recompute, drained CMS cells equal the batch cell table, and the MG
    state keeps its guarantee vs exact counts."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    docs = tables.load(spark, SF_SMOKE, "documents")

    # offline: quality fit + per-bin baseline (the PSI monitor's model)
    feats = T._qc_features(docs).localCheckpoint(eager=True)
    n = feats.count()
    w = T.quality_classifier_fit(feats, n)
    bin_col = F.least(
        F.floor(T.quality_score_col(w) * T.QC_CAL_BINS).cast("int"),
        F.lit(T.QC_CAL_BINS - 1),
    )
    fit_bin = (
        feats.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=True)
    )

    stream = _doc_stream(spark, tmp_path)
    k, d, cw = 8, 2, 64
    hh_state: dict = {"counters": {}, "n_total": 0}
    cms_state: dict = {"cells": None}
    psi: dict[int, float] = {}

    def each(bdf, bid):
        psi[bid] = C.quality_psi_batch(bdf, w, fit_bin, n, bid).collect()[0].psi
        C.heavy_hitters_fold(hh_state, bdf, k)
        C.freq_sketch_fold(cms_state, bdf, d, cw)

    q = (
        stream.writeStream.foreachBatch(each)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "stack_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    assert sorted(psi) == [0, 1, 2, 3]

    # PSI: replay each written file through the stateless batch reading
    import glob

    files = sorted(glob.glob(str(tmp_path / "docs") + "/*.parquet"), key=os.path.getmtime)
    for i, f in enumerate(files):
        bdf = spark.read.schema(docs.schema).parquet(f)
        want = C.quality_psi_batch(bdf, w, fit_bin, n, i).collect()[0].psi
        assert psi[i] == want

    # CMS: drained cells == the batch cell table over the whole corpus
    toks = docs.select(F.explode(T.tokens_col("text")).alias("token"))
    want_cells = sorted(map(tuple, T._cms_cells(toks, d, cw).collect()))
    assert sorted(map(tuple, cms_state["cells"].collect())) == want_cells

    # MG: totals exact; guarantee holds vs exact counts
    exact = {
        r["token"]: r["n"]
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    nn = sum(exact.values())
    assert hh_state["n_total"] == nn
    assert len(hh_state["counters"]) <= k
    for t, est in hh_state["counters"].items():
        assert est <= exact.get(t, 0) <= est + nn / (k + 1)
    for t, c in exact.items():
        if c * (k + 1) > nn:
            assert t in hh_state["counters"]


def test_quantile_sketch_restart_durable(spark, tmp_path):
    """Round-8 verdict #2 (kill-and-restart criterion): with a
    `DurableSketchState`, the standing sketch after a restart mid-stream —
    including Structured Streaming's redelivery of the in-flight batch
    with the SAME batch id — is row-for-row equal to the uninterrupted
    run's state AND to the batch whole-corpus sketch; replaying a batch
    twice is a no-op fold."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import aggregates as A
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    ev = tables.load(spark, SF_SMOKE, "events")
    batches = [ev.where(F.col("event_id") % 3 == i).localCheckpoint() for i in range(3)]
    emitted_a: dict[int, list] = {}
    emitted_b: dict[int, list] = {}

    # uninterrupted run
    store_a = C.DurableSketchState(spark, str(tmp_path / "state_a"))
    h = C.quantile_sketch_handler(
        lambda bid, df: emitted_a.__setitem__(bid, sorted(map(tuple, df.collect()))),
        store=store_a,
    )
    for i, b in enumerate(batches):
        h(b, i)

    # killed after committing batch 1, restarted: a NEW handler (fresh
    # in-memory state) on the same store; batch 1 is redelivered first
    store_b = C.DurableSketchState(spark, str(tmp_path / "state_b"))
    h1 = C.quantile_sketch_handler(
        lambda bid, df: emitted_b.__setitem__(bid, sorted(map(tuple, df.collect()))),
        store=store_b,
    )
    h1(batches[0], 0)
    h1(batches[1], 1)
    rows_before_replay = sorted(map(tuple, store_b.load()[0].collect()))
    h2 = C.quantile_sketch_handler(
        lambda bid, df: emitted_b.__setitem__(bid, sorted(map(tuple, df.collect()))),
        store=store_b,
    )
    h2(batches[1], 1)  # redelivered in-flight batch: must be a no-op fold
    assert sorted(map(tuple, store_b.load()[0].collect())) == rows_before_replay
    h2(batches[2], 2)

    sa, bid_a = store_a.load()
    sb, bid_b = store_b.load()
    assert bid_a == bid_b == 2
    got_a = sorted(map(tuple, sa.collect()))
    got_b = sorted(map(tuple, sb.collect()))
    want = sorted(map(tuple, A._qsk_bottomk(A._qsk_partials(ev)).collect()))
    assert got_a == got_b == want and len(want) > 0
    assert emitted_a[2] == emitted_b[2]


def test_heavy_hitters_restart_durable(spark, tmp_path):
    """MG restart durability: counters + running total survive a restart
    exactly; the redelivered batch folds zero times."""
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    rows = [(i, " ".join(["alpha", "alpha", f"tail{i}"] + (["beta"] if i % 3 == 0 else []))) for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batches = [docs.where(F.col("doc_id") % 3 == i).localCheckpoint() for i in range(3)]
    k = 4

    store_a = C.DurableSketchState(spark, str(tmp_path / "hh_a"))
    emit_a: dict[int, tuple] = {}
    h = C.heavy_hitters_handler(
        lambda bid, n, c: emit_a.__setitem__(bid, (n, c)), k=k, store=store_a
    )
    for i, b in enumerate(batches):
        h(b, i)

    store_b = C.DurableSketchState(spark, str(tmp_path / "hh_b"))
    emit_b: dict[int, tuple] = {}
    h1 = C.heavy_hitters_handler(
        lambda bid, n, c: emit_b.__setitem__(bid, (n, c)), k=k, store=store_b
    )
    h1(batches[0], 0)
    h1(batches[1], 1)
    h2 = C.heavy_hitters_handler(
        lambda bid, n, c: emit_b.__setitem__(bid, (n, c)), k=k, store=store_b
    )
    h2(batches[1], 1)  # replay: no double count
    h2(batches[2], 2)

    assert emit_a[2] == emit_b[2]
    # totals are EXACT counts — a double fold would show immediately
    n_tokens = 90 * 3 + 30
    assert emit_b[2][0] == n_tokens
    # restart-loaded state equals the uninterrupted dict state
    da, _ = store_a.load()
    db, _ = store_b.load()
    key = lambda r: (r[0] or "", *r[1:])
    assert sorted(map(tuple, da.collect()), key=key) == sorted(
        map(tuple, db.collect()), key=key
    )


def test_freq_sketch_restart_durable_real_stream(spark, tmp_path):
    """TRUE kill-and-restart through Structured Streaming: run 1 drains the
    first two files with a checkpointLocation + DurableSketchState, the
    query stops (availableNow), two MORE files land, and run 2 — a fresh
    stream, fresh handler, EMPTY in-memory state — resumes from the same
    checkpoint + store. The drained standing cells must equal the batch
    cell table over ALL four files (offset checkpoint and effect store
    stay aligned — the reference's exactly-once-effect lesson applied to
    the monitors)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    docs = tables.load(spark, SF_SMOKE, "documents")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "cmsdocs")
    ckpt = str(tmp_path / "cms_restart_ckpt")
    store = C.DurableSketchState(spark, str(tmp_path / "cms_state"))
    d, w = 2, 64
    bids: list[int] = []

    cdc_stream.write_ordered_files(first, path, n_files=2, order_col="doc_id")
    stream1 = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q1 = (
        C.freq_sketch_stream(stream1, lambda bid, cells: bids.append(bid), d=d, w=w, store=store)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q1.awaitTermination(600)
    assert bids == [0, 1]

    cdc_stream.write_ordered_files(second, path, n_files=2, order_col="doc_id")
    stream2 = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q2 = (
        C.freq_sketch_stream(stream2, lambda bid, cells: bids.append(bid), d=d, w=w, store=store)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q2.awaitTermination(600)
    assert bids == [0, 1, 2, 3]

    cells, last_bid = store.load()
    assert last_bid == 3
    toks = docs.select(F.explode(T.tokens_col("text")).alias("token"))
    want = sorted(map(tuple, T._cms_cells(toks, d, w).collect()))
    assert sorted(map(tuple, cells.collect())) == want and len(want) > 0


def test_sketch_stream_checkpoint_release_bounded(spark):
    """Round-8 ADVICE: the NON-durable monitors' per-step localCheckpoints
    must not accumulate — each fold releases its predecessor's blocks, so
    N folds leave exactly ONE new persisted RDD (per monitor), not N."""
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    sc = spark.sparkContext

    def persisted_ids():
        return {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3} common") for i in range(60)],
        "doc_id long, text string",
    )
    base = persisted_ids()
    cms_state: dict = {"cells": None}
    for i in range(5):
        C.freq_sketch_fold(cms_state, docs.where(F.col("doc_id") % 5 == i), 2, 16)
    assert len(persisted_ids() - base) == 1

    ev = spark.createDataFrame(
        [(i, "t", float(i % 13)) for i in range(60)],
        "event_id long, event_type string, value double",
    )
    base = persisted_ids()
    served: list = []
    h = C.quantile_sketch_handler(lambda bid, df: served.append(df.count()))
    for i in range(5):
        h(ev.where(F.col("event_id") % 5 == i), i)
    assert len(persisted_ids() - base) == 1


def test_monitoring_stack_durable_composed_restart(spark, tmp_path):
    """The round-9 deployment form of the composed monitoring stack: the MG
    and CMS handlers run in ONE foreachBatch, EACH with its own
    DurableSketchState, through a true Structured Streaming
    kill-and-restart (checkpointLocation + new files between runs). After
    draining, both standing states equal their batch recomputes over the
    whole corpus — the composition preserves each monitor's standalone
    durable contract."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    docs = tables.load(spark, SF_SMOKE, "documents")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "stackdocs")
    ckpt = str(tmp_path / "stack_ckpt")
    k, d, w = 8, 2, 64

    def run_once():
        """Fresh handlers + empty in-memory state each run — everything
        standing must come back from the stores."""
        hh = C.heavy_hitters_handler(
            lambda bid, n, c: None, k=k,
            store=C.DurableSketchState(spark, str(tmp_path / "hh_state")),
        )
        cms = C.freq_sketch_handler(
            lambda bid, cells: None, d=d, w=w,
            store=C.DurableSketchState(spark, str(tmp_path / "cms_state")),
        )

        def each(bdf, bid):
            hh(bdf, bid)
            cms(bdf, bid)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        q = (
            stream.writeStream.foreachBatch(each)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(600)

    cdc_stream.write_ordered_files(first, path, n_files=2, order_col="doc_id")
    run_once()
    cdc_stream.write_ordered_files(second, path, n_files=2, order_col="doc_id")
    run_once()

    toks = docs.select(F.explode(T.tokens_col("text")).alias("token"))
    cells, bid = C.DurableSketchState(spark, str(tmp_path / "cms_state")).load()
    assert bid == 3
    want_cells = sorted(map(tuple, T._cms_cells(toks, d, w).collect()))
    assert sorted(map(tuple, cells.collect())) == want_cells

    hh_df, hh_bid = C.DurableSketchState(spark, str(tmp_path / "hh_state")).load()
    assert hh_bid == 3
    st = C.heavy_hitters_state_load(hh_df)
    exact = {
        r["token"]: r["n"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n")).collect()
    }
    nn = sum(exact.values())
    assert st["n_total"] == nn and len(st["counters"]) <= k
    for t, est in st["counters"].items():
        assert est <= exact.get(t, 0) <= est + nn / (k + 1)
    for t, c in exact.items():
        if c * (k + 1) > nn:
            assert t in st["counters"]


def test_embed_drift_stream_equals_batch(spark, tmp_path):
    """Streaming embedding-drift twin: each micro-batch's reading equals
    the stateless batch recompute over that file's vectors, against the
    same frozen (centroids, fit histogram, total)."""
    import glob

    from boletia_kubernetes_kafka_mongodb_spark.operators import similarity as S
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    emb = tables.load(spark, SF_SMOKE, "embeddings")
    cent = S.kmeans_init_centroids(emb).localCheckpoint(eager=True)
    assign = S.kmeans_assign_with(emb, cent)
    fit_bin = (
        assign.groupBy(F.col("cluster").alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=True)
    )
    n = assign.count()

    path = str(tmp_path / "embfiles")
    cdc_stream.write_ordered_files(emb, path, n_files=3, order_col="vec_id")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    emitted: dict[int, tuple] = {}

    def emit(df):
        r = df.collect()[0]
        emitted[r.batch_id] = (r.n, r.psi, r.drifted, r.low_sample)

    q = (
        C.embed_drift_stream(stream, cent, fit_bin, n, emit)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "embdrift_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    assert sorted(emitted) == [0, 1, 2]

    files = sorted(glob.glob(path + "/*.parquet"), key=os.path.getmtime)
    for i, f in enumerate(files):
        bdf = spark.read.schema(emb.schema).parquet(f)
        r = C.embed_drift_batch(bdf, cent, fit_bin, n, i).collect()[0]
        assert emitted[i] == (r.n, r.psi, r.drifted, r.low_sample)
        assert r.n > 0


def test_freq_sketch_durable_random_schedules(spark, tmp_path):
    """Protocol fuzz for the durable handlers: seeded random interleavings
    of {fold next batch, redeliver the in-flight batch, crash+restart
    (fresh handler, empty in-memory state, optional redelivery)} must all
    drain to the exact batch cell table — the full generality of the
    Structured Streaming replay contract, beyond the three crafted
    scenarios."""
    import random

    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    batches = [
        spark.createDataFrame(
            [(j, f"tok{j % 5} x{j % 3} common") for j in range(i * 10, i * 10 + 10)],
            "doc_id long, text string",
        ).localCheckpoint()
        for i in range(4)
    ]
    d, w = 2, 16
    alldocs = batches[0]
    for b in batches[1:]:
        alldocs = alldocs.unionByName(b)
    toks = alldocs.select(F.explode(T.tokens_col("text")).alias("token"))
    want = sorted(map(tuple, T._cms_cells(toks, d, w).collect()))

    for seed in range(5):
        rng = random.Random(seed)
        store = C.DurableSketchState(spark, str(tmp_path / f"sched{seed}"))
        h = C.freq_sketch_handler(lambda bid, cells: None, d, w, None, store)
        nxt = 0
        while nxt < len(batches):
            roll = rng.random()
            if roll < 0.25 and nxt > 0:
                # redelivery of the already-committed in-flight batch
                h(batches[nxt - 1], nxt - 1)
            elif roll < 0.5:
                # crash: the handler (and all driver state) is lost;
                # restart builds a fresh one over the same store, and the
                # stream may redeliver the last batch first
                h = C.freq_sketch_handler(lambda bid, cells: None, d, w, None, store)
                if nxt > 0 and rng.random() < 0.7:
                    h(batches[nxt - 1], nxt - 1)
            else:
                h(batches[nxt], nxt)
                nxt += 1
        cells, last_bid = store.load()
        assert last_bid == len(batches) - 1, f"seed {seed}"
        assert sorted(map(tuple, cells.collect())) == want, f"seed {seed}"


def test_fertility_stream_equals_batch(spark, tmp_path):
    """Tokenizer-drift twin: per micro-batch fertility readings under the
    frozen offline merges equal the stateless batch recompute per file,
    and the whole-stream token totals reconcile with the batch audit
    operator's corpus totals."""
    import glob

    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T
    from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C

    merges = [(m[1], m[2]) for m in T._bpe_learn(spark, SF_SMOKE)]
    stream = _doc_stream(spark, tmp_path, n_files=3)
    emitted: dict[int, list] = {}

    def emit(df):
        rows = df.collect()
        if rows:
            emitted[rows[0].batch_id] = sorted(map(tuple, rows))

    q = (
        C.fertility_stream(stream, merges, emit)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "fert_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    assert sorted(emitted) == [0, 1, 2]

    docs = tables.load(spark, SF_SMOKE, "documents")
    files = sorted(glob.glob(str(tmp_path / "docs") + "/*.parquet"), key=os.path.getmtime)
    for i, f in enumerate(files):
        bdf = spark.read.schema(docs.schema).parquet(f)
        want = sorted(map(tuple, C.fertility_batch(bdf, merges, i).collect()))
        assert emitted[i] == want and len(want) > 0

    # whole-stream totals == the batch audit's corpus totals per language
    from collections import defaultdict

    tot = defaultdict(lambda: [0, 0])
    for rows in emitted.values():
        for _bid, lang, nw, nb, _f, _c in rows:
            tot[lang][0] += nw
            tot[lang][1] += nb
    batch = {
        r.lang: (r.n_words, r.n_tokens_bpe)
        for r in T.ext_tokenizer_fertility(spark, SF_SMOKE).collect()
    }
    assert {k: tuple(v) for k, v in tot.items()} == batch


# --- round 10: streaming ANN index maintenance ------------------------------


def _refresh_fixtures(spark):
    """(frozen assign_udf, standing assigned frame, arriving frame)."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import similarity as S
    from boletia_kubernetes_kafka_mongodb_spark.operators.sampling import (
        split_assignment,
    )

    assign_udf, _, _ = S._ivf_standing_quantizer(spark, SF_SMOKE)
    emb = tables.load(spark, SF_SMOKE, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    standing = emb.where(split_assignment("vec_id") != "test").withColumn(
        "ivf_list", assign_udf("embedding")
    )
    arriving = emb.where(split_assignment("vec_id") == "test")
    return assign_udf, standing, arriving


def _serve_recall_at_k(idx, C_arr, qvecs, k=5, nprobe=4):
    """recall@k of the index's REAL partition-pruned serve path (nearest
    ``nprobe`` lists by the quantizer ``C_arr``, then exact rerank of the
    served candidates) against the index-free exact top-k over the same
    committed rows — the promotion audit for a candidate (re-)clustering.
    Accepts a live ``IncrementalIvfIndex`` OR a candidate DataFrame (what
    ``rebase(audit=...)`` stages). Ties broken by vec_id on BOTH sides so
    identical-vector rows cannot flake the metric."""
    import numpy as np

    from pyspark.sql import DataFrame as _DF

    if isinstance(idx, _DF):
        _read = lambda: idx  # noqa: E731
        _probe = lambda ls: idx.where(F.col("ivf_list").isin(ls))  # noqa: E731
    else:
        _read, _probe = idx.read, idx.probe

    def _topk(ids, X, qn):
        sims = np.round((X @ qn) / np.linalg.norm(X, axis=1), 6)
        order = np.lexsort((ids, -sims))
        return set(ids[order[:k]].tolist())

    rows = _read().select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    C = np.asarray(C_arr, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    hits = 0
    for q in qvecs:
        qn = np.asarray(q, dtype=np.float64)
        qn = qn / np.linalg.norm(qn)
        exact = _topk(ids, X, qn)
        lists = np.argsort(-np.round(Cn @ qn, 6), kind="stable")[:nprobe]
        served = (
            _probe([int(li) for li in lists])
            .select("vec_id", "embedding")
            .collect()
        )
        if served:
            sids = np.array([r.vec_id for r in served])
            SX = np.array([r.embedding for r in served], dtype=np.float64)
            hits += len(exact & _topk(sids, SX, qn))
    return hits / (k * len(qvecs))


def test_index_refresh_stream_equals_batch_refresh(spark, tmp_path):
    """The streaming form of ext_ann_index_refresh: base init + per-batch
    frozen-quantizer appends through a REAL Structured Streaming query
    drain to exactly the batch operator's refreshed layout, and the
    incremental probe is partition-pruned in every constituent scan."""
    from boletia_kubernetes_kafka_mongodb_spark import plans
    from boletia_kubernetes_kafka_mongodb_spark.operators import similarity as S
    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
        read_layout,
    )

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_ivf"))
    idx.init_base(standing)

    path = str(tmp_path / "arriving")
    cdc_stream.write_ordered_files(arriving, path, n_files=3, order_col="vec_id")
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    applied: dict[int, bool] = {}
    q = (
        corpus.index_refresh_stream(
            stream, idx, assign_udf, emit=lambda bid, ok: applied.setdefault(bid, ok)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "idx_ckpt"))
        .start()
    )
    q.awaitTermination(600)
    assert applied == {0: True, 1: True, 2: True}

    got = sorted(
        map(tuple, idx.read().select("vec_id", "ivf_list").collect())
    )
    batch_path = S.ensure_refreshed_ivf_layout(spark, SF_SMOKE)
    want = sorted(
        map(
            tuple,
            read_layout(spark, batch_path).select("vec_id", "ivf_list").collect(),
        )
    )
    assert got == want and len(got) > 0

    plan = plans.explain_str(idx.probe([0, 3]))
    import re

    assert plan.count("PartitionFilters") >= 2  # base scan + delta scans
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        assert "ivf_list" in m.group(1)


def test_index_refresh_replay_and_midswap_crash(spark, tmp_path):
    """Replay of a committed batch is a no-op; a crash between the delta
    write and the pointer flip leaves the batch uncommitted, and the
    redelivered batch commits WITHOUT duplicating rows."""
    import pytest

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )
    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    batches = [
        arriving.where(F.col("vec_id") % 2 == 0),
        arriving.where(F.col("vec_id") % 2 == 1),
    ]
    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_ivf2"))
    idx.init_base(standing)
    h = corpus.index_refresh_handler(idx, assign_udf)

    h(batches[0], 0)
    n_after_0 = idx.read().count()
    h(batches[0], 0)  # redelivery of a committed batch: no-op
    assert idx.read().count() == n_after_0

    # crash mid-append: delta written, pointer never flips
    real = _snapshot.write_pointer

    def boom(*a, **k):
        raise RuntimeError("simulated crash before pointer flip")

    _snapshot.write_pointer = boom
    try:
        with pytest.raises(RuntimeError):
            h(batches[1], 1)
    finally:
        _snapshot.write_pointer = real
    # a restarted process sees only the committed state
    fresh = IncrementalIvfIndex(spark, str(tmp_path / "inc_ivf2"))
    assert fresh.current()[1] == 0
    assert fresh.read().count() == n_after_0

    # redelivery after the crash commits exactly once
    h2 = corpus.index_refresh_handler(fresh, assign_udf)
    h2(batches[1], 1)
    want = standing.count() + batches[0].count() + batches[1].count()
    assert fresh.read().count() == want


def test_index_refresh_compact_bounds_and_preserves(spark, tmp_path):
    """Compaction folds base + committed deltas into one base snapshot:
    identical rows before and after, absorbed deltas collected, an
    uncommitted future delta left alone, and a second compaction stable."""
    import os

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_ivf3"))
    idx.init_base(standing)
    h = corpus.index_refresh_handler(idx, assign_udf)
    h(arriving.where(F.col("vec_id") % 2 == 0), 0)
    h(arriving.where(F.col("vec_id") % 2 == 1), 1)

    before = sorted(map(tuple, idx.read().select("vec_id", "ivf_list").collect()))
    # simulate a crashed FUTURE append: delta exists but was never committed
    os.makedirs(os.path.join(idx.path, "delta_v9"))

    idx.compact()
    after = sorted(map(tuple, idx.read().select("vec_id", "ivf_list").collect()))
    assert after == before
    entries = sorted(os.listdir(idx.path))
    assert entries == ["CURRENT", "base_v1", "delta_v9"]

    idx.compact()  # idempotent-ish: still the same rows, still one base
    assert sorted(
        map(tuple, idx.read().select("vec_id", "ivf_list").collect())
    ) == before
    assert sorted(os.listdir(idx.path)) == ["CURRENT", "base_v2", "delta_v9"]


def test_drift_gated_reindex_composition(spark, tmp_path):
    """The full index-lifecycle loop the round-9 verdict sketched, in one
    composed foreachBatch program: per arriving batch, (1) the embedding
    drift reading vs the FROZEN index geometry, (2) the frozen-quantizer
    append to the incremental index — and when drift FIRES, the re-index:
    every vector re-assigned under a NEW quantizer via rebase(), which
    preserves the replay horizon so redelivery across the re-index is
    still a no-op."""
    import numpy as np

    from boletia_kubernetes_kafka_mongodb_spark.operators import similarity as S
    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )

    K = 4
    assign_udf, standing, arriving = _refresh_fixtures(spark)

    # frozen drift geometry: K cells from the standing corpus's first K
    # non-null vectors (rank ids, the kmeans_init_centroids derivation)
    cent_rows = (
        standing.orderBy("vec_id").limit(K).select("embedding").collect()
    )
    cent = spark.createDataFrame(
        [(i, [float(x) for x in r.embedding]) for i, r in enumerate(cent_rows)],
        "cluster int, cvec array<double>",
    ).localCheckpoint(eager=True)
    fit_assign = S.kmeans_assign_with(standing, cent)
    fit_bin = (
        fit_assign.groupBy(F.col("cluster").alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=True)
    )
    n_fit = fit_assign.count()

    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_ivf_drift"))
    idx.init_base(standing)
    append = corpus.index_refresh_handler(idx, assign_udf)

    # batch 0: in-distribution (real held-out vectors). batch 1: a HARD
    # shift — every row is the same standing vector, so the whole batch
    # collapses onto one drift cell.
    b0 = arriving
    one_vec = [float(x) for x in cent_rows[2].embedding]
    max_id = int(
        tables.load(spark, SF_SMOKE, "embeddings")
        .agg(F.max("vec_id"))
        .first()[0]
    )
    b1 = spark.createDataFrame(
        [(max_id + 1 + i, one_vec, 0) for i in range(60)],
        "vec_id long, embedding array<double>, label int",
    )

    readings: dict[int, tuple] = {}

    def composed(bdf, bid):
        r = corpus.embed_drift_batch(bdf, cent, fit_bin, n_fit, bid, k=K).collect()[0]
        readings[bid] = (r.psi, bool(r.drifted))
        append(bdf, bid)

    composed(b0, 0)
    composed(b1, 1)
    assert not readings[0][1], f"in-distribution batch drifted: {readings[0]}"
    assert readings[1][1] and readings[1][0] > 0.5, f"shift not caught: {readings[1]}"

    # drift fired → re-cluster: NEW quantizer from the GROWN corpus (its
    # K lowest vec_ids — the values matter less than the mechanics: every
    # row re-assigned, one base, replay horizon preserved)
    # materialize BEFORE rebase: the scan references the old base,
    # which rebase GCs after its pointer flip (lazy reads would 404)
    grown = (
        idx.read().select("vec_id", "embedding", "label")
        .localCheckpoint(eager=True)
    )
    new_cent = sorted(
        grown.orderBy("vec_id").limit(S.IVF_NLIST).collect(),
        key=lambda r: r.vec_id,
    )
    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        make_cosine_assign_udf,
    )

    C_new = np.array([r.embedding for r in new_cent], dtype=np.float64)
    assign2 = make_cosine_assign_udf(C_new)

    # PROMOTION GATE (r10 verdict #4): a re-clustering is promoted only if
    # its serve quality clears the audit — through the engine API itself:
    # rebase(audit=...) stages the candidate base, audits it, and flips
    # the pointer ONLY on a pass. Audit = recall@k of the pruned probe
    # path vs the index-free exact top-k over the same rows.
    GATE = 0.6
    qvecs = [list(r.embedding) for r in cent_rows[:3]] + [one_vec]
    C_frozen = S._ivf_standing_quantizer(spark, SF_SMOKE)[1]
    rec_before = _serve_recall_at_k(idx, C_frozen, qvecs)
    assert rec_before >= GATE, f"serving index fails its own audit: {rec_before}"

    audited: list[float] = []

    def audit(cand):
        rec = 0.0 if cand is None else _serve_recall_at_k(cand, C_new, qvecs)
        audited.append(rec)
        return rec >= GATE

    # negative control: a quantizer that PLACES each vector in its
    # farthest list while probes still look at the nearest lists — the
    # staged audit must reject it, leaving the serving index untouched
    n_serving = idx.read().count()
    promoted = idx.rebase(
        grown.withColumn("ivf_list", make_cosine_assign_udf(-C_new)("embedding")),
        audit=audit,
    )
    assert promoted is False and audited[-1] < GATE, (
        f"audit failed to reject the broken candidate: {audited}"
    )
    assert idx.read().count() == n_serving  # committed state intact

    # the real candidate clears the gate → rebase commits
    promoted = idx.rebase(
        grown.withColumn("ivf_list", assign2("embedding")), audit=audit
    )
    assert promoted is True and audited[-1] >= GATE, audited

    # and the PROMOTED index passes the same audit it was admitted under
    rec_after = _serve_recall_at_k(idx, C_new, qvecs)
    assert rec_after >= GATE, f"promoted index fails the audit: {rec_after}"

    # the re-indexed state: every vector placed by the NEW quantizer
    got = sorted(map(tuple, idx.read().select("vec_id", "ivf_list").collect()))
    want = sorted(
        map(
            tuple,
            grown.select("vec_id", assign2("embedding").cast("int")).collect(),
        )
    )
    assert got == want and len(got) == standing.count() + b0.count() + 60

    # replay across the re-index: batch 1 redelivered → still a no-op
    h2 = corpus.index_refresh_handler(idx, assign2)
    h2(b1, 1)
    assert idx.read().count() == len(want)
    # and the stream continues against the new frozen quantizer
    b2 = spark.createDataFrame(
        [(max_id + 100 + i, one_vec, 0) for i in range(5)],
        "vec_id long, embedding array<double>, label int",
    )
    h2(b2, 2)
    assert idx.read().count() == len(want) + 5


def test_index_refresh_bootstrap_without_base(spark, tmp_path):
    """A pure-delta bootstrap: appends before any base init commit and
    serve correctly (the stream-first deployment that builds its index
    from nothing), and a later compact folds them into the first base."""
    import os

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )

    assign_udf, _standing, arriving = _refresh_fixtures(spark)
    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_nobase"))
    h = corpus.index_refresh_handler(idx, assign_udf)
    h(arriving.where(F.col("vec_id") % 2 == 0), 0)
    h(arriving.where(F.col("vec_id") % 2 == 1), 1)

    want_n = arriving.count()
    assert idx.read().count() == want_n
    assert idx.current() == (None, 1)

    idx.compact()
    assert idx.read().count() == want_n
    assert sorted(os.listdir(idx.path)) == ["CURRENT", "base_v0"]
    # replay across the compaction still gated
    h(arriving.where(F.col("vec_id") % 2 == 1), 1)
    assert idx.read().count() == want_n


def test_drift_and_append_compose_in_one_true_stream(spark, tmp_path):
    """Monitoring + maintenance in ONE real Structured Streaming
    foreachBatch: every arriving micro-batch gets its drift reading vs
    the frozen geometry AND its frozen-quantizer append to the
    incremental index — the deployment program, not handler simulation."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import similarity as S
    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )

    K = 4
    assign_udf, standing, arriving = _refresh_fixtures(spark)
    cent_rows = standing.orderBy("vec_id").limit(K).select("embedding").collect()
    cent = spark.createDataFrame(
        [(i, [float(x) for x in r.embedding]) for i, r in enumerate(cent_rows)],
        "cluster int, cvec array<double>",
    ).localCheckpoint(eager=True)
    fit_assign = S.kmeans_assign_with(standing, cent)
    fit_bin = (
        fit_assign.groupBy(F.col("cluster").alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=True)
    )
    n_fit = fit_assign.count()

    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_composed"))
    idx.init_base(standing)
    append = corpus.index_refresh_handler(idx, assign_udf)
    readings: dict[int, float] = {}

    def composed(bdf, bid):
        r = corpus.embed_drift_batch(bdf, cent, fit_bin, n_fit, bid, k=K).collect()[0]
        readings[bid] = r.psi
        append(bdf, bid)

    path = str(tmp_path / "arrive_files")
    cdc_stream.write_ordered_files(arriving, path, n_files=2, order_col="vec_id")
    q = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .writeStream.foreachBatch(composed)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "composed_ckpt"))
        .start()
    )
    q.awaitTermination(600)

    assert sorted(readings) == [0, 1] and all(v >= 0 for v in readings.values())
    assert idx.current()[1] == 1
    assert idx.read().count() == standing.count() + arriving.count()


def test_index_refresh_empty_batch_cannot_poison(spark, tmp_path):
    """Round-10 ADVICE (high): a micro-batch whose embeddings are all NULL
    reaches append() with ZERO rows after the handler's isNotNull filter —
    a partitionBy write of that frame creates a tree holding only
    _SUCCESS, which spark.read.parquet rejects (UNABLE_TO_INFER_SCHEMA).
    The batch must still advance the replay horizon (exactly-once), but
    committing the parquet-less dir would poison every subsequent
    read()/probe()/compact() — the exact failure class the pointer
    protocol exists to prevent."""
    import os

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )
    from boletia_kubernetes_kafka_mongodb_spark.streaming._snapshot import (
        write_pointer,
    )

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_empty"))
    idx.init_base(standing)
    n_standing = idx.read().count()
    applied: dict[int, bool] = {}
    h = corpus.index_refresh_handler(
        idx, assign_udf, emit=lambda bid, ok: applied.setdefault(bid, ok)
    )

    # batch 0: every embedding NULL → 0 rows survive the handler filter
    empty = arriving.withColumn(
        "embedding", F.lit(None).cast(arriving.schema["embedding"].dataType)
    )
    h(empty, 0)
    assert applied == {0: True}  # committed (horizon advanced) ...
    assert idx.current()[1] == 0
    assert not os.path.exists(os.path.join(idx.path, "delta_v0"))  # ... dirless
    assert idx.read().count() == n_standing  # index still fully readable

    h(empty, 0)  # redelivery of the committed empty batch: replay no-op
    assert applied == {0: True}

    # the stream continues: a real batch, probes, and compaction all work
    h(arriving, 1)
    assert idx.read().count() == n_standing + arriving.count()
    idx.compact()
    assert idx.read().count() == n_standing + arriving.count()

    # self-healing for layouts poisoned BEFORE this guard existed: a
    # committed delta dir with no data files is skipped by readers
    poisoned = os.path.join(idx.path, "delta_v7")
    os.makedirs(poisoned)
    open(os.path.join(poisoned, "_SUCCESS"), "w").close()
    base, _ = idx.current()
    write_pointer(idx.path, base, 7)
    assert idx.read().count() == n_standing + arriving.count()
    idx.compact()  # and compaction folds past it (then GCs it)
    assert not os.path.exists(poisoned)


def test_index_rebase_to_empty_representable(spark, tmp_path):
    """A rebase that absorbs everything away (0 rows) must commit as
    pointer "-:{last}" — never as a parquet-less base tree — preserving
    the replay horizon so the index can keep accepting batches."""
    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_rebase_empty"))
    idx.init_base(standing)
    h = corpus.index_refresh_handler(idx, assign_udf)
    h(arriving, 0)

    idx.rebase(idx.read().limit(0))  # e.g. a retention purge dropped all
    assert idx.current() == (None, 0)  # empty state, horizon preserved
    idx.compact()  # nothing to fold: no-op, not a crash
    assert idx.current() == (None, 0)

    h(arriving, 0)  # replay across the empty rebase: still gated
    assert idx.current() == (None, 0)
    h(arriving, 1)  # and new batches land normally
    assert idx.read().count() == arriving.count()


def test_index_fuzz_append_compact_rebase_crash(spark, tmp_path):
    """Round-10 verdict #3: seeded random schedules over {append next,
    redeliver previous, EMPTY append, compact, rebase to a new quantizer,
    crash mid-append / mid-compact / mid-rebase (+ restart)} must all
    drain to the exact python-model table: committed vec_ids placed by
    the CURRENT quantizer generation, horizon monotone.

    Round-13 extension: a second failure flavor — FATAL fsync (EIO)
    during the pre-flip flush — which, unlike the process crash, aborts
    the commit in a still-running writer: the operation raises OSError,
    committed state is untouched, and the writer's staged tree is
    eagerly reclaimed (no stray delta/base for the aborted step).

    Round-13 extension #2 — POINTER CORRUPTION + heal: before a random
    op, the CURRENT file is overwritten with garbage (or created as
    garbage where none existed). The op must raise
    PointerCorruptionError, destroy NOTHING (the committed trees and the
    corrupt pointer itself survive as evidence), and after the operator
    heals the pointer — rewriting the saved 13-byte (name, bid) pair, or
    deleting the garbage file where none existed — the schedule resumes
    and still drains to the exact model table."""
    import errno
    import random

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )
    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    NLISTS, NB = 4, 5
    batch_vids = [list(range(i * 8, i * 8 + 8)) for i in range(NB)]

    def assigned(vids, g):
        # generation-g quantizer: ivf_list = (vec_id + g) % NLISTS
        return spark.createDataFrame(
            [(v, (v + g) % NLISTS) for v in vids], "vec_id long, ivf_list int"
        )

    class _Crash(Exception):
        pass

    real_wp = _snapshot.write_pointer
    real_ft = _snapshot.fsync_tree

    def boom(*a, **k):
        raise _Crash("crash before pointer flip")

    def eio_tree(path):
        raise OSError(errno.EIO, "injected fatal fsync")

    def heal(path, saved_ptr):
        # the operator's recovery: restore the saved 13-byte (name, bid)
        # pair, or delete the garbage file where none had been committed
        if saved_ptr[0] is None:
            os.remove(os.path.join(path, _snapshot.POINTER))
        else:
            real_wp(path, saved_ptr[0], saved_ptr[1])

    corrupt_fired = 0
    for seed in range(5):
        rng = random.Random(4000 + seed)
        path = str(tmp_path / f"fuzz{seed}")
        idx = IncrementalIvfIndex(spark, path)
        # python model: committed vid set, horizon, quantizer generation
        committed: set[int] = set()
        last, g = -1, 0
        empty_bids = {b for b in range(NB) if rng.random() < 0.25}
        nxt = 0
        steps = 0
        while nxt < NB or steps < 12:
            steps += 1
            assert steps < 400, f"seed {seed}: schedule failed to drain"
            roll = rng.random()
            failroll = rng.random()
            crash = failroll < 0.3
            fatal_fsync = 0.3 <= failroll < 0.45
            ptr_corrupt = 0.45 <= failroll < 0.55
            saved_ptr = None
            if crash:
                _snapshot.write_pointer = boom
            elif fatal_fsync:
                _snapshot.fsync_tree = eio_tree
            elif ptr_corrupt:
                saved_ptr = _snapshot.read_pointer(path)
                with open(os.path.join(path, _snapshot.POINTER), "w") as f:
                    f.write("garbage-injected-by-fuzz")
            op = None
            try:
                if roll < 0.35 and nxt < NB:
                    vids = [] if nxt in empty_bids else batch_vids[nxt]
                    op = ("append", nxt)
                    if idx.append(assigned(vids, g), nxt):
                        committed |= set(vids)
                        last = nxt
                        nxt += 1
                elif roll < 0.5 and nxt > 0:
                    b = rng.randrange(nxt)  # redeliver a committed batch
                    op = ("append", b)
                    assert not idx.append(assigned(batch_vids[b], g), b)
                elif roll < 0.7:
                    op = ("rebase",)  # compact IS a rebase of current rows
                    idx.compact()
                elif roll < 0.9 and committed:
                    g2 = g + 1
                    op = ("rebase",)
                    idx.rebase(assigned(sorted(committed), g2))
                    g = g2
                else:
                    if nxt >= NB:
                        if ptr_corrupt:
                            heal(path, saved_ptr)  # no op ran to observe it
                        continue
                    vids = [] if nxt in empty_bids else batch_vids[nxt]
                    op = ("append", nxt)
                    if idx.append(assigned(vids, g), nxt):
                        committed |= set(vids)
                        last = nxt
                        nxt += 1
            except _Crash:
                # uncommitted attempt; restart sees only committed state
                idx = IncrementalIvfIndex(spark, path)
            except _snapshot.PointerCorruptionError:
                assert ptr_corrupt, (
                    f"seed {seed} step {steps}: corruption raise with no "
                    f"injected corruption"
                )
                # destroyed NOTHING: the corrupt pointer itself survives as
                # evidence (not GC'd, not overwritten by the failed op)
                with open(os.path.join(path, _snapshot.POINTER)) as f:
                    assert f.read() == "garbage-injected-by-fuzz", (
                        f"seed {seed} step {steps}: op altered the corrupt "
                        f"pointer instead of raising over it"
                    )
                heal(path, saved_ptr)
                corrupt_fired += 1
            except OSError:
                # fatal-fsync abort in a LIVE writer: no restart needed —
                # committed state untouched and the aborted step's staged
                # tree reclaimed. The stray-free guarantee is specific to
                # the tree THIS op staged; earlier process crashes
                # legitimately leave uncommitted future deltas behind.
                assert fatal_fsync, f"seed {seed} step {steps}: unexpected OSError"
                base, _bid = idx.current()
                entries = set(os.listdir(path))
                if op[0] == "append":
                    assert f"delta_v{op[1]}" not in entries or op[1] <= _bid, (
                        f"seed {seed} step {steps}: aborted append left a stray"
                    )
                else:
                    nv = int(base.split("_v")[1]) + 1 if base else 0
                    assert f"base_v{nv}" not in entries, (
                        f"seed {seed} step {steps}: aborted rebase left a stray"
                    )
            finally:
                _snapshot.write_pointer = real_wp
                _snapshot.fsync_tree = real_ft
            assert idx.current()[1] == last, f"seed {seed} step {steps}"

        want = sorted((v, (v + g) % NLISTS) for v in committed)
        if want:
            got = sorted(
                map(tuple, idx.read().select("vec_id", "ivf_list").collect())
            )
            assert got == want, f"seed {seed}"
        assert idx.current()[1] == last == NB - 1, f"seed {seed}"
    assert corrupt_fired > 0, "pointer-corruption flavor never fired across seeds"


def test_rebase_audit_crash_leaves_serving_state_and_self_heals(spark, tmp_path):
    """An audit that RAISES (promotion job dies mid-audit) must leave the
    serving state untouched — and the staged candidate tree is reclaimed
    EAGERLY before the exception propagates (round-11 ADVICE: a
    crash-looping promotion job re-writes the full index-sized candidate
    each attempt, so deferring GC to the next successful rebase leaks
    disk equal to the whole index for as long as the job keeps dying)."""
    import os

    import pytest

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    idx = IncrementalIvfIndex(spark, str(tmp_path / "inc_auditcrash"))
    idx.init_base(standing)
    before = sorted(map(tuple, idx.read().select("vec_id", "ivf_list").collect()))

    cand = idx.read().withColumn("ivf_list", (F.col("ivf_list") + 1) % 3)

    def exploding_audit(c):
        raise RuntimeError("audit job died")

    with pytest.raises(RuntimeError, match="audit job died"):
        idx.rebase(cand.localCheckpoint(eager=True), audit=exploding_audit)

    # serving state untouched AND the staged tree already reclaimed
    fresh = IncrementalIvfIndex(spark, str(tmp_path / "inc_auditcrash"))
    assert sorted(
        map(tuple, fresh.read().select("vec_id", "ivf_list").collect())
    ) == before
    assert not os.path.exists(os.path.join(fresh.path, "base_v1"))

    # a later successful rebase still works from the intact serving state
    ok = fresh.rebase(
        fresh.read().localCheckpoint(eager=True), audit=lambda c: c is not None
    )
    assert ok is True
    assert sorted(
        map(tuple, fresh.read().select("vec_id", "ivf_list").collect())
    ) == before
    assert sorted(os.listdir(fresh.path)) == ["CURRENT", "base_v1"]


def test_index_memo_invalidated_on_external_reset(spark, tmp_path):
    """Round-12 ADVICE (low): the committed-dir has-parquet memo is keyed
    on dir path and committed dirs are immutable IN protocol — but an
    out-of-band reset (wipe + recreate of the index path under a live
    instance) can reuse a committed-dir NAME, leaving a stale False
    verdict that permanently excludes the new, valid dir. current() must
    detect the pointer regression (base version or bid going backwards)
    and drop the memo."""
    import shutil

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )
    from boletia_kubernetes_kafka_mongodb_spark.streaming._snapshot import (
        write_pointer,
    )

    path = str(tmp_path / "inc_reset")
    idx = IncrementalIvfIndex(spark, path)

    # a legacy-poisoned layout: committed pointer naming a parquet-less
    # tree (pre-empty-batch-guard state the self-heal exists for)
    os.makedirs(os.path.join(path, "base_v0"))
    write_pointer(path, "base_v0", 3)
    assert idx._committed_dirs() == []  # memoizes base_v0 -> False
    assert idx._pq_memo[os.path.join(path, "base_v0")] is False

    # external reset: wipe the path, recreate the SAME dir name with
    # real data (fresh instance elsewhere ran init_base -> base_v0:-1)
    _, standing, _ = _refresh_fixtures(spark)
    shutil.rmtree(path)
    fresh = IncrementalIvfIndex(spark, path)
    fresh.init_base(standing)
    assert fresh.current()[0] == "base_v0"

    # the LIVE original instance must now see the valid dir: the bid
    # regression (3 -> -1) proves the reset and drops the stale memo
    assert idx.current() == ("base_v0", -1)
    dirs = idx._committed_dirs()
    assert dirs == [os.path.join(path, "base_v0")]
    assert idx.read().count() == standing.count()


def test_single_writer_contract_append_during_rebase(spark, tmp_path):
    """Round-12 verdict #7: an append landing between rebase()'s current()
    read and its pointer flip must NOT be silently lost. The single-writer
    contract is asserted at the commit point: rebase re-checks the pointer
    it captured at entry, raises RuntimeError, reclaims its staged tree,
    and leaves the concurrent append's commit (delta dir + advanced
    horizon) fully intact. A retry from fresh state then succeeds."""
    import pytest as _pytest

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    path = str(tmp_path / "inc_sole_writer")
    idx = IncrementalIvfIndex(spark, path)
    idx.init_base(standing)
    assert idx.current() == ("base_v0", -1)

    arrived = arriving.withColumn("ivf_list", assign_udf("embedding"))
    arrived = arrived.localCheckpoint(eager=True)
    n_standing, n_arrived = standing.count(), arrived.count()

    # the rebase candidate: derived from committed state BEFORE the
    # concurrent append (so it cannot contain the appended rows)
    candidate = idx.read().repartition("ivf_list").localCheckpoint(eager=True)

    # out-of-contract writer: a SECOND instance appends bid=0 while the
    # rebase is between its state read and its flip (injected via the
    # audit hook, which runs exactly in that window)
    intruder = IncrementalIvfIndex(spark, path)

    def audit_that_races(cand):
        assert intruder.append(arrived, 0) is True
        return True

    with _pytest.raises(RuntimeError, match="single-writer contract"):
        idx.rebase(candidate, audit=audit_that_races)

    # the concurrent commit survived in full: horizon advanced, delta
    # intact, committed rows = standing + appended; staged tree reclaimed
    assert idx.current() == ("base_v0", 0)
    assert sorted(os.listdir(path)) == ["CURRENT", "base_v0", "delta_v0"]
    assert idx.read().count() == n_standing + n_arrived

    # a retry from fresh state commits cleanly and folds the delta
    idx.compact()
    assert idx.current() == ("base_v1", 0)
    assert idx.read().count() == n_standing + n_arrived


def test_single_writer_contract_concurrent_appends(spark, tmp_path):
    """The append-vs-append interleaving: two writers both read horizon
    -1, writer B commits bid=1 first, then writer A's append(bid=0) must
    raise (its flip would regress the horizon 1 -> 0, silently marking
    bid=1 absorbed-then-lost... actually un-committing it) and must NOT
    delete B's committed delta."""
    import pytest as _pytest

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )
    assign_udf, standing, arriving = _refresh_fixtures(spark)
    path = str(tmp_path / "inc_app_app")
    idx_a = IncrementalIvfIndex(spark, path)
    idx_a.init_base(standing)
    idx_b = IncrementalIvfIndex(spark, path)

    arrived = arriving.withColumn("ivf_list", assign_udf("embedding"))
    arrived = arrived.localCheckpoint(eager=True)

    # B lands bid=1 inside A's read->flip window (injected via fsync_tree,
    # which append calls on its own staged delta right before the check)
    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    real_tree = _snapshot.fsync_tree
    fired = []

    def inject(p):
        real_tree(p)
        if not fired and p.endswith("delta_v0"):
            fired.append(True)
            assert idx_b.append(arrived, 1) is True

    _snapshot.fsync_tree = inject
    try:
        with _pytest.raises(RuntimeError, match="single-writer contract"):
            idx_a.append(arrived, 0)
    finally:
        _snapshot.fsync_tree = real_tree

    # B's commit intact — and A's delta_v0, already on disk when B's
    # flip advanced the horizon past it, became committed state under
    # B's commit (b <= last_bid): it must NOT be reclaimed, else the
    # violation handler would delete committed data
    assert idx_a.current() == ("base_v0", 1)
    assert sorted(os.listdir(path)) == ["CURRENT", "base_v0", "delta_v0", "delta_v1"]
    n = idx_a.read().count()
    assert n == standing.count() + 2 * arrived.count()


def test_index_fatal_fsync_aborts_commit_and_reclaims_staging(spark, tmp_path):
    """Round-13: a FATAL fsync (EIO — possibly-dropped pages) during the
    pre-flip flush of an IncrementalIvfIndex writer must abort BEFORE the
    pointer flip, leave the committed state untouched, and eagerly
    reclaim the staged tree (append's delta / rebase's candidate base) so
    a crash-looping job cannot stack index-sized strays. Once fsync
    heals, the same operations commit cleanly."""
    import errno

    import pytest as _pytest

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )
    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    assign_udf, standing, arriving = _refresh_fixtures(spark)
    path = str(tmp_path / "inc_fatal_fsync")
    idx = IncrementalIvfIndex(spark, path)
    idx.init_base(standing)
    assert idx.current() == ("base_v0", -1)
    n0 = idx.read().count()

    arrived = arriving.withColumn("ivf_list", assign_udf("embedding"))
    arrived = arrived.localCheckpoint(eager=True)

    real_fsync = os.fsync

    def eio(fd):
        raise OSError(errno.EIO, "I/O error")

    # append: fatal fsync -> raises, pointer unchanged, delta reclaimed
    os.fsync = eio
    try:
        with _pytest.raises(OSError):
            idx.append(arrived, 0)
    finally:
        os.fsync = real_fsync
    assert idx.current() == ("base_v0", -1)
    assert sorted(os.listdir(path)) == ["CURRENT", "base_v0"]
    assert idx.read().count() == n0

    # rebase: fatal fsync -> raises, committed base intact, staged base
    # reclaimed (no stray base_v1)
    candidate = idx.read().repartition("ivf_list").localCheckpoint(eager=True)
    os.fsync = eio
    try:
        with _pytest.raises(OSError):
            idx.rebase(candidate)
    finally:
        os.fsync = real_fsync
    assert idx.current() == ("base_v0", -1)
    assert sorted(os.listdir(path)) == ["CURRENT", "base_v0"]

    # fsync healthy again: both operations commit
    assert idx.append(arrived, 0) is True
    assert idx.current() == ("base_v0", 0)
    idx.compact()
    assert idx.current() == ("base_v1", 0)
    assert idx.read().count() == n0 + arrived.count()


def test_index_pointer_naming_missing_base_raises(spark, tmp_path):
    """Round-13 (review finding): the missing-snapshot-raises invariant
    must hold for the INDEX store too, not just SnapshotDir. rebase
    writes the base tree before the flip and GC never removes the named
    base, so a pointer naming a missing base proves out-of-band
    deletion — previously _committed_dirs' has-parquet walk of the
    missing dir returned False and SILENTLY excluded it: read()/probe()
    served deltas only, and the next compact()/rebase() would commit the
    shrunken state. A missing committed DELTA stays legitimate (0-row
    batches advance the horizon without writing any dir)."""
    import shutil

    import pytest

    from boletia_kubernetes_kafka_mongodb_spark.sources.layouts import (
        IncrementalIvfIndex,
    )
    from boletia_kubernetes_kafka_mongodb_spark.streaming._snapshot import (
        PointerCorruptionError,
    )

    path = str(tmp_path / "inc_missing_base")
    idx = IncrementalIvfIndex(spark, path)
    frame = spark.createDataFrame(
        [(v, v % 4) for v in range(8)], "vec_id long, ivf_list int"
    )
    idx.init_base(frame)
    assert idx.current() == ("base_v0", -1)

    # legitimate: an EMPTY append advances the horizon with no delta dir
    empty = spark.createDataFrame([], "vec_id long, ivf_list int")
    assert idx.append(empty, 0)
    assert idx.current() == ("base_v0", 0)
    assert sorted(e for e in os.listdir(path) if e.startswith("delta")) == []

    # out-of-band deletion of the NAMED base: every entry point raises
    shutil.rmtree(os.path.join(path, "base_v0"))
    with pytest.raises(PointerCorruptionError):
        idx.current()
    with pytest.raises(PointerCorruptionError):
        idx.read()
    with pytest.raises(PointerCorruptionError):
        idx.append(frame, 1)
    with pytest.raises(PointerCorruptionError):
        idx.compact()
    # a FRESH instance (no warm memo) raises identically
    with pytest.raises(PointerCorruptionError):
        IncrementalIvfIndex(spark, path).current()
