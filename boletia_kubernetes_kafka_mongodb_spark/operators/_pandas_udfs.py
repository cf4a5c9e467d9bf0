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
