"""blocked_fuzzy_join property tests: the three-lever implementation
(name dedupe + compound blocking + threshold levenshtein) must be
EXACTLY equivalent to brute force within the stated blocking contract —
candidates share the prefix, distance ≤ k, winner by (distance, key).
Random short strings hit the hazards the fixture can't: names shorter
than the prefix, length-band boundaries, duplicate names, probes with
no match, ties across different names."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from minerva_etl_46_spark.operators.fuzzyjoin import blocked_fuzzy_join

NAME = st.text(alphabet="ab ", min_size=1, max_size=9).map(str.strip) \
    .filter(lambda s: len(s) >= 1)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(probes, dim, k, prefix_len, block_suffix=False):
    """The blocking contract, row-at-a-time: candidates share the
    prefix_len prefix (with block_suffix also: OR the last-prefix_len
    suffix); lev ≤ k; winner = min (lev, key, name)."""
    out = {}
    for pid, pname in probes:
        best = None
        for key, dname in dim:
            blocked = pname[:prefix_len] == dname[:prefix_len]
            if block_suffix:
                blocked = blocked or pname[-prefix_len:] == dname[-prefix_len:]
            if not blocked:
                continue
            d = _lev(pname, dname)
            if d > k:
                continue
            c = (d, key, dname)
            if best is None or c < best:
                best = c
        if best is not None:
            out[pid] = best
    return out


@given(
    dim_names=st.lists(NAME, min_size=1, max_size=12),
    probe_names=st.lists(NAME, min_size=1, max_size=8),
    k=st.integers(min_value=1, max_value=3),
    prefix_len=st.integers(min_value=1, max_value=4),
    dup=st.booleans(),
)
@settings(max_examples=12, deadline=None)
def test_matches_bruteforce_within_blocking_contract(
        spark, dim_names, probe_names, k, prefix_len, dup):
    dim = [(i, n) for i, n in enumerate(dim_names)]
    if dup:  # duplicate names with distinct keys: min-key tie-break
        dim += [(len(dim) + i, n) for i, n in enumerate(dim_names[:3])]
    probes = [(100 + i, n) for i, n in enumerate(probe_names)]

    got_df = blocked_fuzzy_join(
        spark.createDataFrame(probes, "probe_id long, probe_name string"),
        spark.createDataFrame(dim, "key long, name string"),
        probe_name_col="probe_name", dim_name_col="name",
        dim_key_col="key", max_distance=k, prefix_len=prefix_len,
    )
    got = {r.probe_id: (r.lev, r.key, r.name) for r in got_df.collect()}
    assert got == _brute(probes, dim, k, prefix_len)


@given(
    dim_names=st.lists(NAME, min_size=1, max_size=12),
    probe_names=st.lists(NAME, min_size=1, max_size=8),
    k=st.integers(min_value=1, max_value=3),
    prefix_len=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=12, deadline=None)
def test_suffix_union_matches_bruteforce(
        spark, dim_names, probe_names, k, prefix_len):
    """block_suffix=True must be exactly equivalent to brute force
    under the widened prefix-OR-suffix blocking contract. Random short
    strings exercise the hazards: names shorter than prefix_len (both
    blocks degenerate to the whole string), pairs sharing both ends
    (duplicate candidates must collapse), and empty-suffix edge."""
    dim = [(i, n) for i, n in enumerate(dim_names)]
    probes = [(100 + i, n) for i, n in enumerate(probe_names)]
    got_df = blocked_fuzzy_join(
        spark.createDataFrame(probes, "probe_id long, probe_name string"),
        spark.createDataFrame(dim, "key long, name string"),
        probe_name_col="probe_name", dim_name_col="name",
        dim_key_col="key", max_distance=k, prefix_len=prefix_len,
        block_suffix=True,
    )
    got = {r.probe_id: (r.lev, r.key, r.name) for r in got_df.collect()}
    assert got == _brute(probes, dim, k, prefix_len, block_suffix=True)


def test_prefix_corruption_caught_only_by_suffix_union(spark):
    """The motivating case (the docstring's stated blocking miss): a
    corruption INSIDE the prefix4 window. Prefix-only blocking misses
    it; the r9 prefix∪suffix union catches it via the intact tail."""
    probes = spark.createDataFrame([(1, "Xlpha centauri")],
                                   "probe_id long, probe_name string")
    dim = spark.createDataFrame([(7, "alpha centauri")],
                                "key long, name string")
    miss = blocked_fuzzy_join(probes, dim, "probe_name", "name", "key",
                              max_distance=1, prefix_len=4)
    assert miss.count() == 0  # honest prefix-only contract
    hit = blocked_fuzzy_join(probes, dim, "probe_name", "name", "key",
                             max_distance=1, prefix_len=4,
                             block_suffix=True).collect()
    assert len(hit) == 1
    assert (hit[0].key, hit[0].name, hit[0].lev) == (7, "alpha centauri", 1)


def test_rejects_degenerate_parameters(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "probe_id long, probe_name string")
    dim = spark.createDataFrame([(1, "a")], "key long, name string")
    with pytest.raises(ValueError, match="max_distance"):
        blocked_fuzzy_join(df, dim, "probe_name", "name", "key",
                           max_distance=0)
    with pytest.raises(ValueError, match="prefix_len"):
        blocked_fuzzy_join(df, dim, "probe_name", "name", "key",
                           prefix_len=0)


def test_output_column_collisions_are_rejected_and_renameable(spark):
    """Same-named name columns on both sides (the common case) must not
    produce a duplicate-column frame — explicit out_* names resolve it."""
    import pytest

    probes = spark.createDataFrame([(1, "alpha x")],
                                   "probe_id long, name string")
    dim = spark.createDataFrame([(7, "alpha y")], "key long, name string")
    with pytest.raises(ValueError, match="collide"):
        blocked_fuzzy_join(probes, dim, "name", "name", "key")
    got = blocked_fuzzy_join(
        probes, dim, "name", "name", "key",
        out_key_col="match_key", out_name_col="match_name",
        out_dist_col="match_lev",
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.match_key, r.match_name, r.match_lev) == (7, "alpha y", 1)
    # distinct out names are enforced too
    with pytest.raises(ValueError, match="distinct"):
        blocked_fuzzy_join(probes, dim, "name", "name", "key",
                           out_key_col="x", out_name_col="x",
                           out_dist_col="y")


def test_duplicate_dim_keys_tie_break_by_name(spark):
    """When dim keys are NOT unique, two different names can tie on
    (lev, min-key); the winner must then be pinned by name — the r9
    determinism fix. Both candidate names are lev=1 from the probe and
    share key 1, so only the name orders them."""
    probes = spark.createDataFrame([(100, "aaaa")],
                                   "probe_id long, probe_name string")
    dim = spark.createDataFrame([(1, "aaac"), (1, "aaab")],
                                "key long, name string")
    for _ in range(3):  # repeat: row_number on an unpinned order can
        r = blocked_fuzzy_join(  # flip run-to-run; three runs catch it
            probes, dim, "probe_name", "name", "key",
            max_distance=1, prefix_len=3,
        ).collect()
        assert len(r) == 1
        assert (r[0].lev, r[0].key, r[0].name) == (1, 1, "aaab")


@given(
    tail=st.text(alphabet="abcdefgh .", min_size=2, max_size=5),
    n_hot=st.integers(min_value=100, max_value=140),
    prefix_len=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=5, deadline=None)
def test_suffix_guard_trips_on_degenerate_tail(spark, tail, n_hot,
                                               prefix_len):
    """r9 verdict item 5: the low-entropy-tail hazard is now ENFORCED,
    not just documented. A vocabulary where every name carries the same
    tail (legal forms, padded serials) must raise ValueError at call
    time when block_suffix=True — the suffix block would be quadratic.
    The override hatch (suffix_share_guard=None) must still run and
    return the documented union semantics."""
    import pytest

    # 4 pad chars between the varying counter and the tail keep the
    # last-prefix_len-chars suffix key CONSTANT for every prefix_len
    # ≤ 4 and tail length ≥ 0 — without the pad, a 2-char tail under
    # prefix_len=4 leaks the counter's last digit into the suffix key
    # (10 groups of ~12 names, all under the 100-name hot floor)
    dim_rows = [(i, f"body{i:04d}xxxx{tail}") for i in range(n_hot)]
    dim = spark.createDataFrame(dim_rows, "key long, name string")
    probes = spark.createDataFrame([(1, dim_rows[0][1])],
                                   "probe_id long, probe_name string")
    with pytest.raises(ValueError, match="low-entropy-tail"):
        blocked_fuzzy_join(probes, dim, "probe_name", "name", "key",
                           max_distance=1, prefix_len=prefix_len,
                           block_suffix=True)
    # explicit opt-out still computes the (correct) union result
    got = blocked_fuzzy_join(probes, dim, "probe_name", "name", "key",
                             max_distance=1, prefix_len=prefix_len,
                             block_suffix=True,
                             suffix_share_guard=None).collect()
    assert len(got) == 1 and got[0].lev == 0


def test_suffix_guard_passes_healthy_and_tiny_vocabularies(spark):
    """The guard must NOT trip on an end-entropic vocabulary (suffix
    keys well-distributed) nor on a tiny one (under the 100-name hot
    floor a block cannot go quadratic even at 100% share)."""
    healthy = spark.createDataFrame(
        [(i, f"name {i:05d}") for i in range(300)],  # distinct tails
        "key long, name string")
    probes = spark.createDataFrame([(1, "name 00007")],
                                   "probe_id long, probe_name string")
    got = blocked_fuzzy_join(probes, healthy, "probe_name", "name", "key",
                             max_distance=1, prefix_len=4,
                             block_suffix=True).collect()
    assert len(got) == 1 and got[0].key == 7
    tiny = spark.createDataFrame(
        [(i, f"x{i} gmbh") for i in range(20)],  # 100% shared tail, n<100
        "key long, name string")
    p2 = spark.createDataFrame([(1, "x3 gmbh")],
                               "probe_id long, probe_name string")
    got = blocked_fuzzy_join(p2, tiny, "probe_name", "name", "key",
                             max_distance=1, prefix_len=4,
                             block_suffix=True).collect()
    assert len(got) == 1 and got[0].key == 3
