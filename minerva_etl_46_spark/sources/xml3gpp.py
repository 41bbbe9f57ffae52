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
])


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_meas_file(path: str) -> list[dict]:
    """One measCollecFile → long rows (dn, ts, counter, value)."""
    rows: list[dict] = []
    tree = ET.parse(path)
    for mi in tree.iter():
        if _local(mi.tag) != "measInfo":
            continue
        types: dict[str, str] = {}
        end_time = None
        for child in mi:
            lt = _local(child.tag)
            if lt == "granPeriod":
                end_time = child.get("endTime")
            elif lt == "measType":
                types[child.get("p")] = (child.text or "").strip()
            elif lt == "measValue":
                dn = child.get("measObjLdn")
                for r in child:
                    if _local(r.tag) != "r":
                        continue
                    name = types.get(r.get("p"))
                    txt = (r.text or "").strip()
                    try:
                        val = float(txt)
                    except ValueError:
                        val = None
                    rows.append({
                        "dn": dn, "ts": end_time, "counter": name, "value": val,
                    })
    return rows


def harvest_3gpp_xml(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed parse: the PATH LIST parallelizes (one task per slice of
    files), each executor parses locally — the standard pattern for
    many-small-vendor-files ingest at fleet scale."""
    pdf = spark.createDataFrame([(p,) for p in paths], schema="file string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for f in b["file"]:
                for row in parse_meas_file(f):
                    out.append({"file": f, **row})
            yield pd.DataFrame(
                out, columns=["file", "dn", "ts", "counter", "value"]
            )

    n = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    return pdf.repartition(n).mapInPandas(run, schema=ROW_SCHEMA)
