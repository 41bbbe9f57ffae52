#!/usr/bin/env python
"""Regenerate QUERIES.md: the implemented query-key index (key, check
kind, docstring summary) straight from the registry."""

from minerva_etl_46_spark.queries import ORACLES, QUERIES


def main() -> None:
    out = [
        "# QUERIES — the implemented operator surface "
        "(generated: `python make_queries_md.py`)",
        "",
        f"{len(QUERIES)} query keys, {len(ORACLES)} with DuckDB oracles"
        + ("" if len(ORACLES) == len(QUERIES)
           else " (the rest are documented rows-only checks)")
        + ". Each key is one entry in",
        "`__spark_entry__.queries()` mapped to SURVEY.md §2's inventory.",
        "",
        "| key | check | what it proves |",
        "|---|---|---|",
    ]
    for key in sorted(QUERIES):
        doc = (QUERIES[key].__doc__ or "").strip().split("\n\n")[0]
        doc = " ".join(ln.strip() for ln in doc.splitlines())
        if len(doc) > 220:
            doc = doc[:217] + "..."
        check = "oracle" if key in ORACLES else "rows-only"
        out.append(f"| `{key}` | {check} | {doc} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote QUERIES.md, {len(QUERIES)} keys")


if __name__ == "__main__":
    main()
