"""Round-10 property-based tests (SURVEY.md §5.3 continuation): exact
python-model replays of the operators whose correctness rests on string
pre-images and seeded hashing — the territory where this round's one
substantive review finding (the ambiguous row-hash pre-image) lived.

- SCD-2 walk: suppress_unchanged → validity_intervals against a pure-
  python model, with a value strategy built from the EXACT colliding
  shapes the r10 pre-image fix exists for (None vs '' vs '0'/'1'
  nullflag look-alikes, separator-carrying 'a|b' strings).
- md5-family MinHash: minhash_signature replayed shingle-for-shingle,
  seed-for-seed in hashlib — pins the tokens→shingles→digest→seeded-min
  chain against an independent implementation (the DuckDB oracle proves
  cross-engine SQL parity; this proves the FORMULA both engines run is
  the one the docstring states).
- topk_per_group: deterministic tie-breaking vs a python sort under
  heavy order-value ties.

Small example counts — each example is a Spark job."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from minerva_etl_46_spark.operators.attributes import (
    suppress_unchanged,
    validity_intervals,
)
from minerva_etl_46_spark.operators.dedup import minhash_signature
from minerva_etl_46_spark.operators.windows import topk_per_group

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: adversarial attribute values: the exact shapes that collided under the
#: pre-r10 concat_ws pre-image (NULL vs sentinel, separator leakage) plus
#: plain strings. Kept ASCII so Spark/Java and python casing agree.
_attr_values = st.sampled_from(
    [None, "", "a", "b", "a|b", "b|a", "|", "0", "1", "0a", "1a", "x"]
)

_scd2_rows = st.lists(
    st.tuples(
        st.integers(0, 2),        # entity
        st.integers(0, 11),       # ts (unique per entity below)
        _attr_values,             # attr 1
        _attr_values,             # attr 2
    ),
    min_size=1, max_size=24,
    # suppress_unchanged/validity_intervals order by ts alone here, so
    # duplicate (entity, ts) pairs would make both the operator and the
    # model order-dependent — deduplicate the key, keep the first value
    unique_by=lambda r: (r[0], r[1]),
)


def _scd2_model(rows):
    """Pure-python twin of suppress_unchanged → validity_intervals.

    Keep a row when (a1, a2) differs from the PREVIOUS ROW's pair (None
    distinct from every string including ''); then valid_to = next kept
    row's ts, open end = None. Mirrors the operators' lag/lead windows."""
    out = []
    by_entity: dict[int, list] = {}
    for e, ts, a1, a2 in rows:
        by_entity.setdefault(e, []).append((ts, a1, a2))
    for e, items in by_entity.items():
        items.sort(key=lambda t: t[0])
        kept = []
        prev = object()  # sentinel: first row always kept
        for ts, a1, a2 in items:
            if (a1, a2) != prev:
                kept.append((ts, a1, a2))
            prev = (a1, a2)
        for i, (ts, a1, a2) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            out.append((e, ts, a1, a2, ts, nxt))
    return sorted(out, key=lambda t: (t[0], t[1]))


@SLOW
@given(rows=_scd2_rows)
def test_scd2_walk_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        rows, schema="e long, ts long, a1 string, a2 string"
    )
    got = (
        validity_intervals(
            suppress_unchanged(df, "e", "ts", ["a1", "a2"]), "e", "ts"
        )
        .select("e", "ts", "a1", "a2", "valid_from", "valid_to")
        .collect()
    )
    got_t = sorted(
        (r.e, r.ts, r.a1, r.a2, r.valid_from, r.valid_to) for r in got
    )
    assert got_t == _scd2_model(rows)


# --- md5-family MinHash: hashlib replay ------------------------------------

_doc_text = st.lists(
    st.sampled_from(["the", "cat", "sat", "on", "a", "mat", "Dog", "ran", ""]),
    min_size=0, max_size=12,
).map(" ".join)

_docs = st.lists(_doc_text, min_size=1, max_size=6)

_K = 4
_N = 3


def _minhash_model(text: str) -> list[int] | None:
    """hashlib twin of tokens→shingles→md5-digest→seeded-min (dedup.py).

    tokens: lower + split on a single space (empty tokens preserved —
    str.split(' ') matches F.split(col, ' ')); shingles: space-join of
    each n-token slice; per-gram digest md5(gram); seeded member:
    int(md5('{seed}|' + digest)[:15 hex], 16) — 60 bits, like
    conv(substring(md5(...), 1, 15), 16, 10)."""
    toks = text.lower().split(" ")
    if len(toks) < _N:
        return None
    grams = {" ".join(toks[i:i + _N]) for i in range(len(toks) - _N + 1)}
    digests = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    return [
        min(
            int(hashlib.md5(f"{seed}|{d}".encode()).hexdigest()[:15], 16)
            for d in digests
        )
        for seed in range(_K)
    ]


@SLOW
@given(docs=_docs)
def test_minhash_md5_family_matches_hashlib_replay(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), schema="doc_id long, text string"
    )
    sig = minhash_signature(
        df, "doc_id", "text", k=_K, shingle_n=_N, hash_family="md5"
    )
    got = {r.doc_id: [r[f"mh{i}"] for i in range(_K)] for r in sig.collect()}
    for doc_id, text in enumerate(docs):
        expect = _minhash_model(text)
        if expect is None:
            # < n tokens → empty shingle array → no signature row
            assert doc_id not in got, (doc_id, text, got.get(doc_id))
        else:
            assert got[doc_id] == expect, (doc_id, text)


# --- topk_per_group: tie-break determinism vs python sort -------------------

_topk_rows = st.lists(
    st.tuples(
        st.integers(0, 2),    # group
        st.integers(0, 3),    # order value (heavy ties by design)
        st.integers(0, 99),   # id: the tiebreak column
    ),
    min_size=1, max_size=30,
    unique_by=lambda r: (r[0], r[2]),  # ids unique within a group
)


@SLOW
@given(rows=_topk_rows, k=st.integers(1, 4), descending=st.booleans())
def test_topk_per_group_matches_python_model(spark, rows, k, descending):
    df = spark.createDataFrame(rows, schema="g long, v long, id long")
    got = sorted(
        (r.g, r.v, r.id, r.rn)
        for r in topk_per_group(
            df, ["g"], "v", k, descending=descending, tiebreak=["id"]
        ).collect()
    )
    expect = []
    by_group: dict[int, list] = {}
    for g, v, i in rows:
        by_group.setdefault(g, []).append((v, i))
    for g, items in by_group.items():
        items.sort(key=lambda t: (-t[0] if descending else t[0], t[1]))
        expect += [(g, v, i, rn + 1) for rn, (v, i) in enumerate(items[:k])]
    assert got == sorted(expect)


# --- upsert winner selection: null-version ordering vs python model ---------

_ver = st.one_of(st.none(), st.integers(0, 3))

_upsert_rows = st.lists(
    st.tuples(
        st.integers(0, 1),     # src: 0 existing, 1 staged
        st.integers(0, 3),     # key
        _ver,                  # v1 (major)
        _ver,                  # v2 (minor)
        st.integers(0, 99),    # payload x
    ),
    min_size=1, max_size=24,
    # two same-src rows tied on (key, v1, v2) would make the winner
    # nondeterministic (row_number has no further tiebreak) — exclude;
    # cross-src full ties stay in, resolved by the staged-wins rule
    unique_by=lambda r: (r[0], r[1], r[2], r[3]),
)


def _upsert_sort_key(row):
    """desc_nulls_last per version col, then staged (__src=1) wins ties —
    the ordering upsert_latest pins and sources/delta.py's MERGE mirrors."""
    src, _key, v1, v2, _x = row
    return tuple((v is None, -(v if v is not None else 0)) for v in (v1, v2)) \
        + (-src,)


def _upsert_model(rows):
    winners = {}
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r[1], []).append(r)
    for k, items in by_key.items():
        items.sort(key=_upsert_sort_key)
        winners[k] = items[0]
    return {k: (r[2], r[3], r[4]) for k, r in winners.items()}


@SLOW
@given(rows=_upsert_rows)
def test_upsert_latest_winner_matches_python_model(spark, rows):
    from minerva_etl_46_spark.operators.upsert import upsert_latest

    schema = "k long, v1 long, v2 long, x long"
    existing = [(k, v1, v2, x) for s, k, v1, v2, x in rows if s == 0]
    staged = [(k, v1, v2, x) for s, k, v1, v2, x in rows if s == 1]
    if not staged:
        staged = [(999, 0, 0, 0)]
        rows = rows + [(1, 999, 0, 0, 0)]
    got = upsert_latest(
        spark.createDataFrame(existing, schema=schema) if existing else None,
        spark.createDataFrame(staged, schema=schema),
        keys=["k"], version_cols=["v1", "v2"],
    ).collect()
    got_map = {r.k: (r.v1, r.v2, r.x) for r in got}
    assert len(got) == len(got_map)  # one row per key
    assert got_map == _upsert_model(rows)


@SLOW
@given(rows=_upsert_rows, ops=st.data())
def test_upsert_tombstone_matches_python_model(spark, rows, ops):
    """Tombstones must WIN the version race to delete, and a later
    re-insert resurrects the key — modeled as: compute the plain
    keep-latest winner INCLUDING op, then drop keys whose winner is 'D'."""
    from minerva_etl_46_spark.operators.upsert import upsert_with_tombstones

    tagged = [
        r + (ops.draw(st.sampled_from(["U", "D"])) if r[0] == 1 else None,)
        for r in rows
    ]
    schema = "k long, v1 long, v2 long, x long, op string"
    existing = [(k, v1, v2, x, op) for s, k, v1, v2, x, op in tagged if s == 0]
    staged = [(k, v1, v2, x, op) for s, k, v1, v2, x, op in tagged if s == 1]
    if not staged:
        staged = [(999, 0, 0, 0, "U")]
        tagged = tagged + [(1, 999, 0, 0, 0, "U")]
    got = upsert_with_tombstones(
        spark.createDataFrame(existing, schema=schema) if existing else None,
        spark.createDataFrame(staged, schema=schema),
        keys=["k"], version_cols=["v1", "v2"],
    ).collect()
    got_map = {r.k: (r.v1, r.v2, r.x) for r in got}
    assert len(got) == len(got_map)

    by_key: dict[int, list] = {}
    for r in tagged:
        by_key.setdefault(r[1], []).append(r)
    expect = {}
    for k, items in by_key.items():
        items.sort(key=lambda r: _upsert_sort_key(r[:5]))
        win = items[0]
        if win[5] != "D":  # existing rows carry op=NULL → never tombstones
            expect[k] = (win[2], win[3], win[4])
    assert got_map == expect
