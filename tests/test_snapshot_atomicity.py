"""Crash-atomicity of the durable snapshot stores (round-9 verdict #1).

The previous swap (write new → rmtree(old) → os.replace) had a crash
window in which NO snapshot exists; these tests kill the protocol at
every interesting instant and assert the previous committed state is
always recoverable:

- crash BETWEEN the staging write and the pointer flip → the store must
  recover the PREVIOUS committed state (and bid), and a retried save of
  the replayed batch must then commit cleanly and GC the stale staging;
- crash AFTER the flip but before GC (stale predecessor / orphaned
  pointer temps left behind) → the NEW state serves, and the next commit
  self-heals the strays;
- a legitimately 0-row state frame round-trips WITH its batch id (the
  pre-r10 layout's documented "empty reads as absent" caveat is gone);
- the pre-r10 flat layout is still readable (in-place upgrade).

Both durable classes are covered (`DurableSketchState`,
`ParquetMergeTable`), plus a seeded random-schedule fuzz that adds the
mid-swap-crash action to the round-9 replay-protocol fuzz.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from boletia_kubernetes_kafka_mongodb_spark.streaming import corpus as C
from boletia_kubernetes_kafka_mongodb_spark.streaming import sinks
from boletia_kubernetes_kafka_mongodb_spark.streaming._snapshot import SnapshotDir


class _CrashMidSwap(Exception):
    pass


def _boom(self, name, bid):
    raise _CrashMidSwap(f"simulated crash before pointer flip ({name}:{bid})")


def _cells(spark, rows):
    return spark.createDataFrame(rows, "j int, b int, cnt long")


def _sorted(df):
    return sorted(map(tuple, df.collect()))


# --- DurableSketchState ---------------------------------------------------


def test_sketch_crash_between_write_and_flip(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "state")
    store = C.DurableSketchState(spark, path)
    s0 = _cells(spark, [(0, 1, 10), (0, 2, 5)])
    store.save(s0, 0)

    # crash: the v1 staging dir is fully written, the pointer never flips
    monkeypatch.setattr(SnapshotDir, "commit", _boom)
    s1 = _cells(spark, [(0, 1, 12), (0, 2, 9)])
    with pytest.raises(_CrashMidSwap):
        store.save(s1, 1)
    monkeypatch.undo()

    # a restarted process recovers the PREVIOUS committed state, not empty
    fresh = C.DurableSketchState(spark, path)
    got, bid = fresh.load()
    assert bid == 0
    assert _sorted(got) == _sorted(s0)

    # the stream redelivers batch 1; the retried save commits and the
    # crashed attempt's staging dir is garbage-collected
    fresh.save(s1, 1)
    got, bid = C.DurableSketchState(spark, path).load()
    assert bid == 1
    assert _sorted(got) == _sorted(s1)
    assert sorted(os.listdir(path)) == ["CURRENT", "v1"]


def test_sketch_crash_after_flip_self_heals(spark, tmp_path):
    path = str(tmp_path / "state")
    store = C.DurableSketchState(spark, path)
    store.save(_cells(spark, [(0, 1, 1)]), 0)

    # simulate "crash after flip, before GC": strays the GC would have
    # removed are still on disk next to the committed snapshot
    os.makedirs(os.path.join(path, "v_stale_prev"))
    open(os.path.join(path, ".ptr_orphan"), "w").write("junk")

    got, bid = C.DurableSketchState(spark, path).load()
    assert bid == 0 and _sorted(got) == [(0, 1, 1)]

    # the next successful commit collects the strays
    store.save(_cells(spark, [(0, 1, 3)]), 1)
    assert sorted(os.listdir(path)) == ["CURRENT", "v1"]


def test_sketch_empty_state_representable(spark, tmp_path):
    """Round-9 'What's wrong #3': the pointer records the bid, so a 0-row
    committed state at batch N no longer reads as 'no state'."""
    path = str(tmp_path / "state")
    store = C.DurableSketchState(spark, path)
    empty = _cells(spark, []).where(F.lit(False))
    store.save(empty, 3)
    got, bid = C.DurableSketchState(spark, path).load()
    assert bid == 3
    assert got is not None and got.count() == 0
    assert got.columns == ["j", "b", "cnt"]


def test_sketch_legacy_flat_layout_still_loads(spark, tmp_path):
    path = str(tmp_path / "state")
    legacy = _cells(spark, [(1, 7, 42)]).withColumn(
        "_bid", F.lit(5).cast("long")
    )
    legacy.write.mode("overwrite").parquet(path)
    got, bid = C.DurableSketchState(spark, path).load()
    assert bid == 5 and _sorted(got) == [(1, 7, 42)]
    # and the first post-upgrade save moves it to the pointer protocol
    store = C.DurableSketchState(spark, path)
    store.save(_cells(spark, [(1, 7, 50)]), 6)
    got, bid = C.DurableSketchState(spark, path).load()
    assert bid == 6 and _sorted(got) == [(1, 7, 50)]


# --- ParquetMergeTable -----------------------------------------------------


def test_merge_table_crash_between_write_and_flip(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "tbl")
    t = sinks.ParquetMergeTable(spark, path, key="k", order_col="seq")
    b0 = spark.createDataFrame([("a", 1, "x")], "k string, seq long, v string")
    t.upsert_keep_last(b0)

    monkeypatch.setattr(SnapshotDir, "commit", _boom)
    b1 = spark.createDataFrame([("a", 2, "y")], "k string, seq long, v string")
    with pytest.raises(_CrashMidSwap):
        t.upsert_keep_last(b1)
    monkeypatch.undo()

    # restart: the table still serves the last COMMITTED merge
    fresh = sinks.ParquetMergeTable(spark, path, key="k", order_col="seq")
    assert _sorted(fresh.read()) == [("a", 1, "x")]

    # the redelivered batch merges idempotently and commits; the retry
    # overwrites the crashed attempt's v1 staging and GCs the v0 snapshot
    fresh.upsert_keep_last(b1)
    assert _sorted(fresh.read()) == [("a", 2, "y")]
    assert sorted(os.listdir(path)) == ["CURRENT", "v1"]


def test_merge_table_legacy_flat_layout_still_reads(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [("a", 1, "x")], "k string, seq long, v string"
    ).write.mode("overwrite").parquet(path)
    t = sinks.ParquetMergeTable(spark, path, key="k", order_col="seq")
    assert _sorted(t.read()) == [("a", 1, "x")]
    t.upsert_keep_last(
        spark.createDataFrame([("b", 2, "y")], "k string, seq long, v string")
    )
    assert _sorted(t.read()) == [("a", 1, "x"), ("b", 2, "y")]


# --- protocol fuzz with the mid-swap crash action ---------------------------


class _CrashySketchStore(C.DurableSketchState):
    """Save that sometimes writes the staging snapshot and dies before the
    pointer flip — the exact window the round-9 verdict flagged."""

    def __init__(self, spark, path, rng, p_crash=0.3):
        super().__init__(spark, path)
        self._rng = rng
        self._p = p_crash

    def save(self, state_df, bid):
        if self._rng.random() < self._p:
            sub = self._snap.staging(int(bid))
            state_df.withColumn(
                self.BID_COL, F.lit(int(bid)).cast("long")
            ).write.mode("overwrite").parquet(sub)
            raise _CrashMidSwap(f"mid-swap crash at bid {bid}")
        super().save(state_df, bid)


def test_freq_sketch_durable_fuzz_with_midswap_crashes(spark, tmp_path):
    """Round-9 fuzz extended per the verdict's done-criteria: random
    interleavings of {fold, redeliver, restart, CRASH MID-SWAP} must all
    drain to the exact batch cell table."""
    from boletia_kubernetes_kafka_mongodb_spark.operators import text as T

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
        rng = random.Random(1000 + seed)
        store = _CrashySketchStore(spark, str(tmp_path / f"crashy{seed}"), rng)
        h = C.freq_sketch_handler(lambda bid, cells: None, d, w, None, store)
        nxt = 0
        while nxt < len(batches):
            roll = rng.random()
            try:
                if roll < 0.2 and nxt > 0:
                    h(batches[nxt - 1], nxt - 1)  # redelivery, committed
                elif roll < 0.4:
                    # plain crash+restart (handler and in-memory state lost)
                    h = C.freq_sketch_handler(
                        lambda bid, cells: None, d, w, None, store
                    )
                    if nxt > 0 and rng.random() < 0.7:
                        h(batches[nxt - 1], nxt - 1)
                else:
                    h(batches[nxt], nxt)
                    nxt += 1
            except _CrashMidSwap:
                # the failed batch never committed: Structured Streaming
                # fails the query, restart re-folds it from committed state
                h = C.freq_sketch_handler(
                    lambda bid, cells: None, d, w, None, store
                )
        cells, last_bid = store.load()
        assert last_bid == len(batches) - 1, f"seed {seed}"
        assert sorted(map(tuple, cells.collect())) == want, f"seed {seed}"


# --- merge-table protocol fuzz with the mid-swap crash action ---------------


class _CrashyMergeTable(sinks.ParquetMergeTable):
    """_replace_with that sometimes writes the staging snapshot and dies
    before the pointer flip — the merge-table side of the round-9 crash
    window, fuzzed like the sketch stores."""

    def __init__(self, spark, path, key, order_col, rng, p_crash=0.3):
        super().__init__(spark, path, key=key, order_col=order_col)
        self._rng = rng
        self._p = p_crash

    def _replace_with(self, df):
        if self._rng.random() < self._p:
            _, n = self._snap.current()
            df.write.mode("overwrite").parquet(self._snap.staging(n + 1))
            raise _CrashMidSwap(f"mid-swap crash at v{n + 1}")
        super()._replace_with(df)


def test_merge_table_fuzz_random_schedules_with_crashes(spark, tmp_path):
    """Seeded random interleavings of {upsert next batch, redeliver the
    previous batch, crash mid-swap + reconstruct} must drain every
    schedule to the keep-last-by-seq merge of all batches — the
    value-idempotent MERGE contract under the full at-least-once +
    crash-recovery generality.

    Round-13 flavor: POINTER CORRUPTION injected before a random op —
    the merge must raise PointerCorruptionError (never serve the
    flat-layout fallback's silently-empty table), the committed snapshot
    dir survives untouched, and after the operator restores the saved
    pointer the schedule drains to the same merge."""
    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot
    rows = [(f"k{j % 7}", j, f"v{j}") for j in range(24)]
    batches = [
        spark.createDataFrame(rows[i : i + 6], "k string, seq long, v string")
        for i in range(0, 24, 6)
    ]
    # expected: highest-seq row per key across all batches
    want = {}
    for k, seq, v in rows:
        if k not in want or seq > want[k][1]:
            want[k] = (k, seq, v)
    want = sorted(want.values())

    corrupt_total = 0
    for seed in range(5):
        rng = random.Random(2000 + seed)
        path = str(tmp_path / f"mt{seed}")
        t = _CrashyMergeTable(spark, path, key="k", order_col="seq", rng=rng)
        nxt = 0
        corrupt_fired = 0
        while nxt < len(batches):
            roll = rng.random()
            corrupt, saved = rng.random() < 0.2, None
            if corrupt:
                saved = _snapshot.read_pointer(path)
                if saved[0] is None:
                    corrupt = False  # nothing committed yet to corrupt
                else:
                    with open(os.path.join(path, _snapshot.POINTER), "w") as f:
                        f.write("fuzz-garbage")
            try:
                if roll < 0.25 and nxt > 0:
                    t.upsert_keep_last(batches[nxt - 1])  # redelivery
                else:
                    t.upsert_keep_last(batches[nxt])
                    nxt += 1
            except _snapshot.PointerCorruptionError:
                assert corrupt, f"seed {seed}: corruption raise w/o injection"
                # committed snapshot untouched; heal and let the schedule
                # retry the same batch
                assert os.path.isdir(os.path.join(path, saved[0]))
                _snapshot.write_pointer(path, saved[0], saved[1])
                corrupt_fired += 1
            except _CrashMidSwap:
                # the failed merge never committed; reconstruct (restart)
                # and let the stream redeliver — nxt not advanced past an
                # uncommitted batch because the exception aborts the try
                if roll >= 0.25:
                    pass  # the in-flight batch will be retried
                t = _CrashyMergeTable(
                    spark, path, key="k", order_col="seq", rng=rng
                )
        got = sorted(map(tuple, t.read().collect()))
        assert got == want, f"seed {seed}"
        corrupt_total += corrupt_fired
    assert corrupt_total > 0, "corruption flavor never fired across seeds"


def test_heavy_hitters_handler_state_consistent_after_crashed_save(
    spark, tmp_path, monkeypatch
):
    """A save that dies mid-swap must leave the handler's in-memory MG
    state consistent with the store — the fold is adopted only after the
    durable commit, so the recovering retry folds the batch exactly
    once (no double count even if the same handler object survives)."""
    b0 = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "alpha gamma")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(2, "beta beta alpha"), (3, "delta")], "doc_id long, text string"
    )
    store = C.DurableSketchState(spark, str(tmp_path / "hh"))
    emitted = []
    h = C.heavy_hitters_handler(
        lambda bid, n, counters: emitted.append((bid, n, counters)), 8, None, store
    )
    h(b0, 0)
    n0, counters0 = emitted[-1][1], dict(emitted[-1][2])

    monkeypatch.setattr(SnapshotDir, "commit", _boom)
    with pytest.raises(_CrashMidSwap):
        h(b1, 1)
    monkeypatch.undo()

    # the handler's state is STILL batch-0's (the fold was not adopted)
    h(b0, 0)  # replay of the committed batch: served from state, no fold
    assert emitted[-1][1] == n0 and dict(emitted[-1][2]) == counters0

    # retry of batch 1 (same handler surviving, or a restart — same math)
    h(b1, 1)
    bid, n1, counters1 = emitted[-1]
    assert bid == 1 and n1 == n0 + 4  # batch 1 folded exactly once
    assert counters1.get("beta", 0) <= 3 and counters1.get("alpha", 0) <= 4

    # and the durable store agrees with the handler
    df, last = C.DurableSketchState(spark, str(tmp_path / "hh")).load()
    assert last == 1
    assert C.heavy_hitters_state_load(df)["n_total"] == n1


# --- pure-protocol property fuzz (no Spark) ---------------------------------


def test_snapshot_dir_protocol_properties(tmp_path):
    """Hypothesis-style property over the raw pointer protocol (no Spark,
    plain files as snapshot payloads): under any interleaving of
    {stage a write, commit it, crash before commit}, current() always
    returns the LAST COMMITTED (name, bid) with its directory present,
    and after any commit the store holds exactly the pointer + the
    committed dir (GC total)."""
    import os
    import random

    for seed in range(20):
        rng = random.Random(3000 + seed)
        root = str(tmp_path / f"p{seed}")
        snap = SnapshotDir(root)
        committed = (None, -1)
        bid = 0
        for _ in range(rng.randint(3, 12)):
            action = rng.random()
            sub = snap.staging(bid)
            os.makedirs(sub, exist_ok=True)
            with open(os.path.join(sub, "payload"), "w") as f:
                f.write(f"bid={bid}")
            if action < 0.35:
                pass  # crash before commit: staging dir abandoned
            else:
                snap.commit(os.path.basename(sub), bid)
                committed = (os.path.basename(sub), bid)
            # invariant: current() is the last committed pair, dir intact
            cur_dir, cur_bid = snap.current()
            if committed[0] is None:
                assert (cur_dir, cur_bid) == (None, -1), seed
            else:
                assert cur_bid == committed[1], seed
                assert os.path.basename(cur_dir) == committed[0], seed
                with open(os.path.join(cur_dir, "payload")) as f:
                    assert f.read() == f"bid={committed[1]}", seed
                if action >= 0.35:
                    # a successful commit leaves pointer + committed dir ONLY
                    assert sorted(os.listdir(root)) == sorted(
                        ["CURRENT", committed[0]]
                    ), seed
            bid += 1


def test_write_pointer_fsyncs_the_directory(tmp_path, monkeypatch):
    """Round-10 ADVICE (power loss, not just process crash): after the
    os.replace, write_pointer must fsync the STORE DIRECTORY before
    commit()'s GC can run — otherwise a power loss may persist the
    predecessor's rmtree while the rename is still unflushed, leaving
    CURRENT naming a deleted snapshot. Pin the ordering: one fsync on a
    directory fd strictly after the replace."""
    import os

    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    events = []
    real_replace, real_fsync = os.replace, os.fsync

    def rec_replace(src, dst):
        events.append(("replace", dst))
        real_replace(src, dst)

    def rec_fsync(fd):
        st = os.fstat(fd)
        import stat

        events.append(("fsync_dir" if stat.S_ISDIR(st.st_mode) else "fsync_file",))
        real_fsync(fd)

    monkeypatch.setattr(os, "replace", rec_replace)
    monkeypatch.setattr(os, "fsync", rec_fsync)
    _snapshot.write_pointer(str(tmp_path), "v0", 0)

    kinds = [e[0] for e in events]
    assert kinds == ["fsync_file", "replace", "fsync_dir"]
    assert _snapshot.read_pointer(str(tmp_path)) == ("v0", 0)


def test_commit_fsyncs_snapshot_tree_before_pointer_flip(tmp_path, monkeypatch):
    """Round-11 ADVICE (medium): the dir fsync in write_pointer only makes
    the RENAME durable — the parquet data files of the tree the new
    pointer names are written by Spark, which never fsyncs, so a power
    loss could persist the pointer while the snapshot's data is still
    unflushed. Pin that SnapshotDir.commit flushes the named tree
    (fsync_tree) strictly BEFORE the pointer flip."""
    import os

    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    store = _snapshot.SnapshotDir(str(tmp_path))
    staged = store.staging(0)
    os.makedirs(staged)
    with open(os.path.join(staged, "part-0.parquet"), "wb") as f:
        f.write(b"data")

    events = []
    real_tree, real_ptr = _snapshot.fsync_tree, _snapshot.write_pointer
    monkeypatch.setattr(
        _snapshot,
        "fsync_tree",
        lambda p: (events.append(("tree", p)), real_tree(p))[1],
    )
    monkeypatch.setattr(
        _snapshot,
        "write_pointer",
        lambda d, n, b: (events.append(("ptr", n)), real_ptr(d, n, b))[1],
    )
    store.commit("v0", 0)

    assert [e[0] for e in events] == ["tree", "ptr"]
    assert events[0][1] == staged
    assert _snapshot.read_pointer(str(tmp_path)) == ("v0", 0)


def test_fsync_tree_flushes_every_file_and_directory(tmp_path, monkeypatch):
    """fsync_tree must fsync each data file and each directory of the tree
    (bottom-up). Error classes (round-12 ADVICE, medium): the
    NOT-SUPPORTED class (ENOTSUP/EINVAL/...) is swallowed — best-effort
    on filesystems that cannot fsync — but real I/O failures
    (EIO/ENOSPC/EDQUOT) PROPAGATE: on Linux a failed fsync clears the
    kernel page-error state, so the tree may have lost writes and the
    commit must abort before the pointer flip."""
    import errno
    import os
    import stat

    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    root = tmp_path / "base_v0"
    (root / "ivf_list=0").mkdir(parents=True)
    (root / "ivf_list=1").mkdir()
    (root / "ivf_list=0" / "part-0.parquet").write_bytes(b"a")
    (root / "ivf_list=1" / "part-0.parquet").write_bytes(b"b")
    (root / "_SUCCESS").write_bytes(b"")

    files, dirs = [], []
    real_fsync = os.fsync

    def rec_fsync(fd):
        (dirs if stat.S_ISDIR(os.fstat(fd).st_mode) else files).append(fd)
        real_fsync(fd)

    monkeypatch.setattr(os, "fsync", rec_fsync)
    _snapshot.fsync_tree(str(root))
    assert len(files) == 3 and len(dirs) == 3  # 2 parts + _SUCCESS; 2 lists + root

    # not-supported class: must not propagate (no-fsync filesystem)
    monkeypatch.setattr(
        os,
        "fsync",
        lambda fd: (_ for _ in ()).throw(OSError(errno.ENOTSUP, "no fsync here")),
    )
    _snapshot.fsync_tree(str(root))  # must not raise

    # fatal class: EIO means possibly-dropped pages — must propagate
    monkeypatch.setattr(
        os,
        "fsync",
        lambda fd: (_ for _ in ()).throw(OSError(errno.EIO, "I/O error")),
    )
    with pytest.raises(OSError):
        _snapshot.fsync_tree(str(root))


def test_commit_aborts_before_pointer_flip_on_fatal_fsync(tmp_path, monkeypatch):
    """Round-12 ADVICE (medium), end-to-end: when fsync of the staged tree
    fails with a FATAL errno (EIO/ENOSPC/EDQUOT), SnapshotDir.commit must
    raise BEFORE write_pointer runs — the previously committed snapshot
    stays current and nothing is GC'd. A durable pointer may only ever
    name a durably flushed tree."""
    import errno
    import os

    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    store = _snapshot.SnapshotDir(str(tmp_path))
    v0 = store.staging(0)
    os.makedirs(v0)
    with open(os.path.join(v0, "payload"), "w") as f:
        f.write("bid=0")
    store.commit("v0", 0)
    assert _snapshot.read_pointer(str(tmp_path)) == ("v0", 0)

    v1 = store.staging(1)
    os.makedirs(v1)
    with open(os.path.join(v1, "payload"), "w") as f:
        f.write("bid=1")

    for bad in (errno.EIO, errno.ENOSPC, errno.EDQUOT):
        monkeypatch.setattr(
            os, "fsync", lambda fd, _e=bad: (_ for _ in ()).throw(OSError(_e, "boom"))
        )
        with pytest.raises(OSError):
            store.commit("v1", 1)
        monkeypatch.undo()
        # the flip never happened; v0 is still current AND still on disk
        assert _snapshot.read_pointer(str(tmp_path)) == ("v0", 0)
        with open(os.path.join(str(tmp_path), "v0", "payload")) as f:
            assert f.read() == "bid=0"

    # with fsync healthy again the same staged tree commits cleanly
    store.commit("v1", 1)
    assert _snapshot.read_pointer(str(tmp_path)) == ("v1", 1)


def test_commit_refuses_horizon_regression(tmp_path):
    """Round-13: SnapshotDir.commit must refuse a flip that would regress
    the batch horizon — the signature of a concurrent writer having
    committed since this writer read its state. Flipping would un-commit
    that batch AND the GC sweep would delete its snapshot dir, so the
    commit raises and the concurrent commit survives intact."""
    import os

    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    store = _snapshot.SnapshotDir(str(tmp_path))
    for bid in (0, 3):
        sub = store.staging(bid)
        os.makedirs(sub)
        with open(os.path.join(sub, "payload"), "w") as f:
            f.write(f"bid={bid}")
        store.commit(f"v{bid}", bid)
    assert _snapshot.read_pointer(str(tmp_path)) == ("v3", 3)

    # a stale writer (read the store before bid=3 landed) tries bid=1
    stale = store.staging(1)
    os.makedirs(stale)
    with open(os.path.join(stale, "payload"), "w") as f:
        f.write("bid=1")
    with pytest.raises(RuntimeError, match="single-writer contract"):
        store.commit("v1", 1)

    # the concurrent commit survives: pointer AND snapshot dir intact
    assert _snapshot.read_pointer(str(tmp_path)) == ("v3", 3)
    with open(os.path.join(str(tmp_path), "v3", "payload")) as f:
        assert f.read() == "bid=3"

    # equal-bid re-commit stays allowed (idempotent re-flip, no loss)
    store.commit("v3", 3)
    assert _snapshot.read_pointer(str(tmp_path)) == ("v3", 3)

    # and the horizon keeps moving forward normally afterwards
    nxt = store.staging(4)
    os.makedirs(nxt)
    with open(os.path.join(nxt, "payload"), "w") as f:
        f.write("bid=4")
    store.commit("v4", 4)
    assert _snapshot.read_pointer(str(tmp_path)) == ("v4", 4)


def test_corrupt_pointer_raises_instead_of_silently_resetting(tmp_path):
    """Round-13: a pointer file that EXISTS but is unparseable, or that
    names a snapshot dir not on disk, proves out-of-band damage — it must
    raise, not read as "never committed". The silent reset was worse than
    a crash: the next successful commit's GC would delete the real
    predecessor snapshot, converting recoverable damage into loss."""
    import shutil

    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    store_path = str(tmp_path / "store")
    store = _snapshot.SnapshotDir(store_path)

    # the two legitimate "never committed" shapes stay (None, -1)
    assert store.current() == (None, -1)           # store dir absent
    os.makedirs(store_path)
    assert store.current() == (None, -1)           # store dir empty
    flat = tmp_path / "flatfile"
    flat.write_text("not a directory")
    assert _snapshot.read_pointer(str(flat)) == (None, -1)  # ENOTDIR

    # one real committed snapshot
    sub = store.staging(1)
    os.makedirs(sub)
    with open(os.path.join(sub, "payload"), "w") as f:
        f.write("bid=1")
    store.commit("v1", 1)
    assert store.current()[1] == 1

    # every content-corruption flavor raises from BOTH entry points
    ptr = os.path.join(store_path, _snapshot.POINTER)
    for bad in ("", "no-colon-no-bid\n", "v1:notanint\n", "\n"):
        with open(ptr, "w") as f:
            f.write(bad)
        with pytest.raises(_snapshot.PointerCorruptionError):
            _snapshot.read_pointer(store_path)
        with pytest.raises(_snapshot.PointerCorruptionError):
            store.current()

    # heal the pointer, then delete the NAMED tree out of band
    _snapshot.write_pointer(store_path, "v1", 1)
    assert store.current()[1] == 1
    shutil.rmtree(os.path.join(store_path, "v1"))
    with pytest.raises(_snapshot.PointerCorruptionError):
        store.current()

    # commit's own pre-flip horizon read refuses to run over corruption
    with open(ptr, "w") as f:
        f.write("garbage")
    nxt = store.staging(2)
    os.makedirs(nxt)
    with open(os.path.join(nxt, "payload"), "w") as f:
        f.write("bid=2")
    with pytest.raises(_snapshot.PointerCorruptionError):
        store.commit("v2", 2)
    # the corrupt pointer was NOT GC'd or overwritten — evidence preserved
    with open(ptr) as f:
        assert f.read() == "garbage"


def test_corrupt_pointer_surfaces_through_durable_stores(spark, tmp_path):
    """The stores built on SnapshotDir (merge table, sketch state) must
    surface pointer corruption loudly instead of falling back to the
    legacy flat-layout probe (which would read the store as absent)."""
    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    path = str(tmp_path / "tbl")
    tbl = sinks.ParquetMergeTable(spark, path, key="j", order_col="b")
    tbl.upsert_keep_last(_cells(spark, [(1, 1, 10)]))
    assert _sorted(tbl.read()) == [(1, 1, 10)]

    with open(os.path.join(path, _snapshot.POINTER), "w") as f:
        f.write("torn")
    with pytest.raises(_snapshot.PointerCorruptionError):
        tbl.read()
    with pytest.raises(_snapshot.PointerCorruptionError):
        tbl.upsert_keep_last(_cells(spark, [(2, 2, 20)]))

    # heal → the committed rows are still there, untouched by the episode
    vdirs = [e for e in os.listdir(path) if e.startswith("v")]
    assert len(vdirs) == 1
    _snapshot.write_pointer(path, vdirs[0], 1)
    assert _sorted(tbl.read()) == [(1, 1, 10)]


def test_pointer_codec_roundtrip_property():
    """Property: write_pointer → read_pointer is the identity for every
    protocol-shaped (name, bid) pair — including the index store's "-"
    no-base sentinel, names containing ':' (rsplit must split on the
    LAST colon), and the full signed-bid range. Guards the parser
    against future format edits now that a parse failure RAISES."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from boletia_kubernetes_kafka_mongodb_spark.streaming import _snapshot

    name_st = st.one_of(
        st.just("-"),  # IncrementalIvfIndex._NO_BASE sentinel
        st.from_regex(r"(v|base_v|delta_v)[0-9]{1,9}", fullmatch=True),
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789_.:-",
            min_size=1,
            max_size=40,
        ),
    )

    with tempfile.TemporaryDirectory() as d:

        @given(name=name_st, bid=st.integers(min_value=-1, max_value=2**62))
        @settings(max_examples=200, deadline=None)
        def roundtrip(name, bid):
            _snapshot.write_pointer(d, name, bid)
            assert _snapshot.read_pointer(d) == (name, bid)

        roundtrip()
