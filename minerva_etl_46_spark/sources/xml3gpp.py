"""3GPP XML measurement-file harvest (SURVEY.md §2.1 S2).

The reference parses 3GPP TS 32.435 measurement result files
(measCollecFile → measData → measInfo → measValue) in Python harvesting
plugins [ref: minerva-harvesting 3GPP plugin — UNVERIFIED [L]].

Spark-first shape: file paths fan out over the cluster; each partition
parses its files with the stdlib ElementTree inside ``mapInPandas``
(Arrow-batched rows out). The parser is REAL (stdlib xml), not stubbed —
only vendor-specific counter post-processing would be plugin territory.

Namespace handling: 3GPP files carry versioned namespaces; matching is
done on local tag names so any 32.435 revision parses.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROW_SCHEMA = T.StructType([
    T.StructField("file", T.StringType(), False),
    T.StructField("dn", T.StringType(), True),        # measObjLdn
    T.StructField("ts", T.StringType(), True),        # granPeriod endTime (ISO)
    T.StructField("counter", T.StringType(), True),   # measType name
    T.StructField("value", T.DoubleType(), True),
    T.StructField("suspect", T.BooleanType(), False),  # measValue suspect flag
])


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_value(txt: str) -> float | None:
    # TS 32.435 NULL markers: empty or "NIL"; anything unparsable → NULL
    txt = txt.strip()
    if not txt or txt.upper() == "NIL":
        return None
    try:
        return float(txt)
    except ValueError:
        return None


def parse_meas_file(path: str) -> list[dict]:
    """One measCollecFile → long rows (dn, ts, counter, value, suspect).

    Handles both TS 32.435 result encodings:
      - per-counter: ``<measType p="1">n</measType>`` + ``<r p="1">v</r>``
      - legacy list: ``<measTypes>a b c</measTypes>`` +
        ``<measResults>1 2 3</measResults>`` (space-separated, positional)
    plus per-measValue ``<suspect>true</suspect>`` flags and NIL values —
    the shapes a real multi-vendor fleet emits, not just the round-trip
    renderer's subset."""
    rows: list[dict] = []
    tree = ET.parse(path)
    for mi in tree.iter():
        if _local(mi.tag) != "measInfo":
            continue
        types: dict[str, str] = {}
        type_list: list[str] = []
        end_time = None
        for child in mi:
            lt = _local(child.tag)
            if lt == "granPeriod":
                end_time = child.get("endTime")
            elif lt == "measType":
                types[child.get("p")] = (child.text or "").strip()
            elif lt == "measTypes":
                type_list = (child.text or "").split()
            elif lt == "measValue":
                dn = child.get("measObjLdn")
                pending: list[dict] = []
                suspect = False
                for r in child:
                    rt = _local(r.tag)
                    if rt == "r":
                        pending.append({
                            "dn": dn, "ts": end_time,
                            "counter": types.get(r.get("p")),
                            "value": _parse_value(r.text or ""),
                        })
                    elif rt == "measResults":
                        vals = (r.text or "").split()
                        for i, v in enumerate(vals):
                            pending.append({
                                "dn": dn, "ts": end_time,
                                "counter": type_list[i]
                                if i < len(type_list) else None,
                                "value": _parse_value(v),
                            })
                    elif rt == "suspect":
                        suspect = (r.text or "").strip().lower() == "true"
                for row in pending:
                    row["suspect"] = suspect
                rows.extend(pending)
    return rows


def harvest_3gpp_xml(spark: SparkSession, paths: list[str],
                     mode: str = "FAILFAST") -> DataFrame:
    """Distributed parse: the PATH LIST parallelizes (one task per slice of
    files), each executor parses locally — the standard pattern for
    many-small-vendor-files ingest at fleet scale. The list frame builds
    JVM-side for small lists (functions/frames.py::small_literal_frame
    — a pickled LocalTableScan costs a Python-worker round-trip per
    call; huge lists fall back past the helper's literal limit).

    ``mode`` is the same FILE-granularity malformed-input contract the
    avro/CSV readers carry (r10 review — this path previously had no
    quarantine, so ONE truncated vendor file aborted the whole fleet
    harvest after task retries): FAILFAST (default) re-raises with the
    source path attached; DROPMALFORMED skips unparseable files and
    keeps the rest — pair with a file-count reconciliation downstream,
    exactly like scan_csv_badrows."""
    from minerva_etl_46_spark.functions.frames import small_literal_frame

    if mode not in ("FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"mode must be FAILFAST or DROPMALFORMED, "
                         f"got {mode!r}")
    drop = mode == "DROPMALFORMED"
    pdf = small_literal_frame(spark, paths, "file", "string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for f in b["file"]:
                try:
                    rows = parse_meas_file(f)
                except Exception as e:
                    if drop:
                        continue
                    # a uniform wrapper: reconstructing arbitrary
                    # exception types with one string arg is not safe
                    raise ValueError(
                        f"harvest_3gpp_xml: {f}: "
                        f"{type(e).__name__}: {e}") from e
                for row in rows:
                    out.append({"file": f, **row})
            yield pd.DataFrame(
                out, columns=["file", "dn", "ts", "counter", "value", "suspect"]
            )

    n = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    return pdf.repartition(n).mapInPandas(run, schema=ROW_SCHEMA)
