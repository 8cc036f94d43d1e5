"""Size-gated broadcast hints.

A pinned ``F.broadcast`` on a side that grows with the data is a latent
executor/driver OOM at lake scale (round-1 verdict). Where a broadcast
is only ever a small-corpus fast path, gate it on the on-disk size of
the source table: below the cap the hint applies; above it (or when the
path is non-local/unreadable, i.e. a real lake) the hint silently
disappears and the join shuffles on its key — the correct 100 TB plan.
Fixed-size dimensions (nation, region, the WB country dim) pin their
hints unconditionally and never go through this gate.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BROADCAST_CAP_BYTES = 256 << 20


def corpus_fits_broadcast(sf_dir: str, table: str) -> bool:
    """True iff ``{sf_dir}/{table}.parquet`` is small enough that frames
    derived from it safely broadcast."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isfile(path):
            size = os.path.getsize(path)
        elif os.path.isdir(path):
            size = sum(
                os.path.getsize(p)
                for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
                if os.path.isfile(p)
            )
        else:
            return False
    except OSError:
        return False
    return size < _BROADCAST_CAP_BYTES


def maybe_broadcast(df: DataFrame, sf_dir: str, table: str) -> DataFrame:
    return F.broadcast(df) if corpus_fits_broadcast(sf_dir, table) else df
