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
import time
import uuid

#: staged .tmp files older than this are crash debris, not an in-flight
#: concurrent append (a pq.write_table of a kilobyte bookkeeping table
#: finishes in milliseconds) — swept opportunistically on later appends
#: so a driver crash between write and rename cannot leak files forever
#: (r10 review). Generous so a stalled-but-alive writer is never raced.
_STALE_TMP_S = 3600.0


def append_table(path: str, table) -> str:
    """Append a ``pyarrow.Table`` to directory ``path`` as a new
    uniquely named part file; returns the file path written."""
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    now = time.time()
    for e in os.listdir(path):
        if e.startswith(".") and e.endswith(".tmp"):
            p = os.path.join(path, e)
            try:
                if now - os.path.getmtime(p) > _STALE_TMP_S:
                    os.remove(p)
            except OSError:
                pass  # raced another sweeper / writer — never fail an append
    # Stage under a dotted temp name and rename into place: a crash
    # mid-write must not leave a truncated part-*.parquet that poisons
    # every later spark.read of the directory (the Spark writer this
    # replaced staged via _temporary+rename for the same reason).
    # os.replace is atomic on the local/POSIX filesystems this targets,
    # and Spark's parquet reader skips dot-prefixed files as hidden.
    name = f"part-{uuid.uuid4().hex}.parquet"
    out = os.path.join(path, name)
    tmp = os.path.join(path, f".{name}.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, out)
    return out
