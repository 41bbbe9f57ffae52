"""Driver-side parquet appends via pyarrow.

Bookkeeping datasets (the trend store's modified log, entity tags) are
driver-side lists at write time; routing them through
``spark.createDataFrame(...).write`` costs a Python-worker-backed
LocalTableScan job per append (~5 s on a cold worker pool) for a file
any parquet writer can produce. Appends here write one uniquely named
``part-<uuid>.parquet`` per call — concurrent appenders never collide,
and ``spark.read.parquet(dir)`` unions the files like any other
dataset.
"""

from __future__ import annotations

import os
import uuid


def append_table(path: str, table) -> str:
    """Append a ``pyarrow.Table`` to directory ``path`` as a new
    uniquely named part file; returns the file path written."""
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, out)
    return out
