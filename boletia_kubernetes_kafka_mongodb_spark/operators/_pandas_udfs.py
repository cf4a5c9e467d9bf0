"""Arrow-batched pandas UDFs.

NOTE 1: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` resolves the type hints at decoration time, and deferred
(stringified) annotations break its signature inspection.

NOTE 2: this module registers itself for cloudpickle BY-VALUE serialization.
Executor Python workers do not share the driver's ``sys.path``, so a UDF
pickled by reference (module path) dies with ModuleNotFoundError on any
cluster where the package isn't shipped via ``--py-files``. By-value
pickling makes every UDF here self-contained on the wire.
"""

import sys

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

try:  # make all UDFs in this module self-contained when serialized
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older cloudpickle without the API
    pass


def make_admission_map_batches():
    """mapInPandas admission fold over (evento, seq)-sorted partitions.

    One python pass per Arrow batch instead of one applyInPandas call per
    group (~1 ms × n_groups of overhead). Groups may span batch boundaries
    within a partition, so per-key state carries across the iterator.
    """

    def fold(batches):
        import pandas as pd

        state = {}  # evento -> available (carries across batches in partition)

        for pdf in batches:
            if pdf.empty:
                continue
            admitted, after = [], []
            for ev, op, qty, cap in zip(
                pdf["evento"], pdf["op"], pdf["cantidad"], pdf["capacidad"]
            ):
                available = state.get(ev)
                if available is None:
                    available = int(cap)
                qty = int(qty)
                if op == "reserve":
                    ok = available >= qty
                    if ok:
                        available -= qty
                else:
                    ok = True
                    available += qty
                state[ev] = available
                admitted.append(ok)
                after.append(available)
            yield pd.DataFrame(
                {
                    "evento": pdf["evento"],
                    "seq": pdf["seq"],
                    "_id": pdf["_id"],
                    "email": pdf["email"],
                    "op": pdf["op"],
                    "cantidad": pdf["cantidad"],
                    "admitted": admitted,
                    "disponible_despues": after,
                }
            )

    return fold


def _unwrap(maybe_broadcast):
    """Accept either raw data or a pyspark Broadcast handle (preferred — the
    closure then ships only the handle and executors fetch the data once per
    JVM instead of once per task)."""
    return maybe_broadcast.value if hasattr(maybe_broadcast, "value") else maybe_broadcast


def make_jaccard_probe(packed_corpus, threshold):
    """mapInPandas probe: each partition's doc_ids vs the packed corpus.

    ``packed_corpus`` = Broadcast of ``(ids, lang_codes, lang_names, masks,
    sizes)`` — doc_id-sorted numpy arrays packed ONCE on the driver
    (uint64 token-set bitmasks over the corpus vocabulary; see
    ``dedup._packed_corpus``). The probe side streams only ``doc_id`` and
    indexes into the broadcast by ``searchsorted`` — no re-tokenization, no
    per-task vocab/mask rebuild (that rebuild was ~60% of the operator wall
    time when every one of 32 fanned tasks repeated it). Per-doc scoring is
    one vectorized AND+popcount row-vs-corpus — exact integer Jaccard, no
    per-pair python.
    """

    def probe(batches):
        import numpy as np
        import pandas as pd

        ids, lang_codes, lang_names, masks, sizes = _unwrap(packed_corpus)

        for pdf in batches:
            my = pdf["doc_id"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(ids, my)
            out_a, out_b, out_lang, out_j = [], [], [], []
            for r, did in zip(idx, my):
                cand = (lang_codes == lang_codes[r]) & (ids > did)
                if not cand.any():
                    continue
                inter = _popcount_rows(masks[cand] & masks[r][None, :])
                union = int(sizes[r]) + sizes[cand] - inter
                with np.errstate(divide="ignore", invalid="ignore"):
                    j = np.where(union > 0, np.round(inter / union, 6), 0.0)
                hit = j >= threshold
                cids = ids[cand][hit]
                out_a.extend([int(did)] * len(cids))
                out_b.extend(int(c) for c in cids)
                out_lang.extend([str(lang_names[lang_codes[r]])] * len(cids))
                out_j.extend(float(x) for x in j[hit])
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "lang": out_lang, "jaccard": out_j}
            )

    return probe


def _popcount_rows(x):
    """Per-row popcount of a (N, W) uint64 array (numpy<2 lacks bitwise_count)."""
    import numpy as np

    v = np.ascontiguousarray(x).view(np.uint8).reshape(x.shape[0], -1)
    return np.unpackbits(v, axis=1).sum(axis=1).astype(np.int64)


def make_jaccard_component_probe(packed_corpus, threshold):
    """mapInPandas probe fused with per-partition component contraction.

    Same packed build/probe as :func:`make_jaccard_probe`, but instead of
    materializing the (dense) qualifying-pair list, edges accumulate in
    numpy arrays and the partition emits only (root, node) star edges of its
    local connected components — ≤ |local nodes| rows instead of ~460
    edges/node. The driver then merges partition-local components; chaining
    a separate contraction UDF was measured 2-3× slower (2.3M rows
    re-serialized through a second python worker).
    """

    def probe(batches):
        import numpy as np
        import pandas as pd

        ids, lang_codes, lang_names, masks, sizes = _unwrap(packed_corpus)

        srcs, dsts = [], []
        for pdf in batches:
            my = pdf["doc_id"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(ids, my)
            for r, did in zip(idx, my):
                cand = (lang_codes == lang_codes[r]) & (ids > did)
                if not cand.any():
                    continue
                inter = _popcount_rows(masks[cand] & masks[r][None, :])
                union = int(sizes[r]) + sizes[cand] - inter
                with np.errstate(divide="ignore", invalid="ignore"):
                    j = np.where(union > 0, np.round(inter / union, 6), 0.0)
                cids = ids[cand][j >= threshold]
                if len(cids):
                    srcs.append(np.full(len(cids), int(did), dtype=np.int64))
                    dsts.append(cids)
        if not srcs:
            return
        s = np.concatenate(srcs)
        d = np.concatenate(dsts)
        local = np.unique(np.concatenate([s, d]))
        si = np.searchsorted(local, s)
        di = np.searchsorted(local, d)
        lab = np.arange(len(local), dtype=np.int64)
        while True:
            prev = lab.copy()
            np.minimum.at(lab, di, lab[si])
            np.minimum.at(lab, si, lab[di])
            lab = np.minimum(lab, lab[lab])
            if np.array_equal(lab, prev):
                break
        yield pd.DataFrame({"doc_a": local[lab], "doc_b": local})

    return probe


def make_cosine_pairs_probe(ids, matrix, threshold):
    """mapInPandas probe: each partition's vectors vs the broadcast matrix.

    ``ids``/``matrix`` = the full corpus (vec_ids, float64 N×D ndarray,
    L2-normalized rows) captured by value. One numpy matmul per batch
    replaces millions of per-pair expression folds.
    """

    def probe(batches):
        import numpy as np
        import pandas as pd

        idvec = np.asarray(_unwrap(ids), dtype=np.int64)
        mat = np.asarray(_unwrap(matrix))

        for pdf in batches:
            my_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mine = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            mine /= np.linalg.norm(mine, axis=1, keepdims=True)
            sims = mine @ mat.T  # (batch, N)
            out_a, out_b, out_s = [], [], []
            for r in range(sims.shape[0]):
                mask = (idvec > my_ids[r]) & (np.round(sims[r], 6) >= threshold)
                for j in np.nonzero(mask)[0]:
                    out_a.append(int(my_ids[r]))
                    out_b.append(int(idvec[j]))
                    out_s.append(float(np.round(sims[r, j], 6)))
            yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cosine": out_s})

    return probe


def make_admission_stateful_processor(state_schema):
    """StatefulProcessor for ``transformWithStateInPandas`` — the admission
    fold on the Spark 4.x arbitrary-state API. Defined HERE so cloudpickle
    serializes the class by value: TWS spawns a fresh python driver worker
    that unpickles the processor without our package on its sys.path.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class AdmissionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._available = handle.getValueState("available", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            pdf = pd.concat(list(rows))
            if pdf.empty:
                return iter(())
            pdf = pdf.sort_values("seq")
            if self._available.exists():
                (available,) = self._available.get()
            else:
                available = int(pdf["capacidad"].iloc[0])
            admitted, after = [], []
            for op, qty in zip(pdf["op"], pdf["cantidad"]):
                qty = int(qty)
                if op == "reserve":
                    ok = available >= qty
                    if ok:
                        available -= qty
                else:
                    ok = True
                    available += qty
                admitted.append(ok)
                after.append(available)
            self._available.update((available,))
            return iter(
                (
                    pd.DataFrame(
                        {
                            "evento": pdf["evento"],
                            "seq": pdf["seq"],
                            "_id": pdf["_id"],
                            "email": pdf["email"],
                            "op": pdf["op"],
                            "cantidad": pdf["cantidad"],
                            "admitted": admitted,
                            "disponible_despues": after,
                        }
                    ),
                )
            )

        def close(self) -> None:
            pass

    return AdmissionProcessor()


def admission_fold_pandas(pdf):
    """The sequential admission fold over one event's rows (seq-sorted).

    Shared by the batch ``applyInPandas`` ledger and (logic-wise) the
    streaming state processor — see streaming/admission.py. Lives here so it
    pickles by value (executor workers can't import the package).
    """
    pdf = pdf.sort_values("seq")
    available = int(pdf["capacidad"].iloc[0])
    admitted, after = [], []
    for op, qty in zip(pdf["op"], pdf["cantidad"]):
        qty = int(qty)
        if op == "reserve":
            ok = available >= qty
            if ok:
                available -= qty
        else:  # cancel: unguarded restitution
            ok = True
            available += qty
        admitted.append(ok)
        after.append(available)
    return pd.DataFrame(
        {
            "evento": pdf["evento"],
            "seq": pdf["seq"],
            "_id": pdf["_id"],
            "email": pdf["email"],
            "op": pdf["op"],
            "cantidad": pdf["cantidad"],
            "admitted": admitted,
            "disponible_despues": after,
        }
    )


@pandas_udf(LongType())
def simhash_from_token_hashes(hash_arrays: pd.Series) -> pd.Series:
    """array<long> of per-token 64-bit hashes → 64-bit SimHash signature.

    Bit-majority vote per position, vectorized in numpy per Arrow batch.
    """
    import numpy as np

    out = np.zeros(len(hash_arrays), dtype=np.int64)
    for i, arr in enumerate(hash_arrays):
        if arr is None or len(arr) == 0:
            continue
        h = np.asarray(arr, dtype=np.int64).view(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).sum(axis=0)
        maj = bits * 2 >= len(h)
        sig = sum(1 << b for b in range(64) if maj[b])  # python int, no overflow
        out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)


def make_containment_probe(packed_corpus, threshold):
    """Same broadcast-probe kernel as :func:`make_jaccard_probe`, scoring
    containment = |A∩B| / min(|A|,|B|) — the asymmetric near-dup measure
    that catches a short document subsumed by a longer one, which plain
    Jaccard misses (a 25-token doc inside a 250-token doc has J ≈ 0.1 but
    containment 1.0)."""

    def probe(batches):
        import numpy as np
        import pandas as pd

        ids, lang_codes, lang_names, masks, sizes = _unwrap(packed_corpus)

        for pdf in batches:
            my = pdf["doc_id"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(ids, my)
            out_a, out_b, out_lang, out_c = [], [], [], []
            for r, did in zip(idx, my):
                cand = (lang_codes == lang_codes[r]) & (ids > did)
                if not cand.any():
                    continue
                inter = _popcount_rows(masks[cand] & masks[r][None, :])
                smaller = np.minimum(int(sizes[r]), sizes[cand])
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = np.where(smaller > 0, np.round(inter / smaller, 6), 0.0)
                hit = c >= threshold
                cids = ids[cand][hit]
                out_a.extend([int(did)] * len(cids))
                out_b.extend(int(x) for x in cids)
                out_lang.extend([str(lang_names[lang_codes[r]])] * len(cids))
                out_c.extend(float(x) for x in c[hit])
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "lang": out_lang, "containment": out_c}
            )

    return probe
