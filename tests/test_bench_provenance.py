"""Fixture provenance for the scale artifacts (round-7 verdict item 1).

``/root/testdata`` is regenerated every round, and a vintage shift once
moved the jaccard ×100 row 42.6 → 56.8 s with the code getting
*better* — proving that cost a re-measure + ablation session because
``SCALE_r*.json`` recorded nothing about the data it measured.  Every
scale artifact now carries ``fixture_fingerprint`` (per-table rows + an
order-independent 64-bit content hash) and a mechanical vintage delta
vs the prior round's artifact.  These tests pin the fingerprint's
contract: deterministic, row-order-independent, content-sensitive; and
the vintage diff's: latest-prior selection, same/changed verdicts, and
the no-prior bootstrap.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

import bench


def test_fixture_fingerprint_shape_and_determinism():
    fp = bench.fixture_fingerprint("/root/testdata/sf0.001")
    assert set(fp) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert fp["region"]["rows"] == 5 and fp["nation"]["rows"] == 25
    for t, v in fp.items():
        assert len(v["hash"]) == 16 and int(v["hash"], 16) >= 0, t
    assert fp == bench.fixture_fingerprint("/root/testdata/sf0.001")


def test_fixture_fingerprint_order_independent_content_sensitive(tmp_path):
    rows = [(1, "a"), (2, "b"), (3, "c")]
    for name, data in (
        ("fwd", rows),
        ("rev", rows[::-1]),
        ("mut", [(1, "a"), (2, "b"), (3, "X")]),
        # round-8 review: a bit_xor fold cancelled any EVEN change to
        # row multiplicities — these two tables (one row duplicated
        # vs another) xor-hashed IDENTICAL; the sum fold must not
        ("dupa", [(1, "a"), (1, "a"), (2, "b")]),
        ("dupb", [(1, "a"), (2, "b"), (2, "b")]),
    ):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table({"k": [r[0] for r in data], "v": [r[1] for r in data]}),
            str(d / "t.parquet"),
        )
    fp = {
        n: bench.fixture_fingerprint(str(tmp_path / n))["t"]
        for n in ("fwd", "rev", "mut", "dupa", "dupb")
    }
    # parquet row order is not content: same multiset -> same hash
    assert fp["fwd"] == fp["rev"]
    # one changed value -> different hash, same rows
    assert fp["mut"]["rows"] == fp["fwd"]["rows"]
    assert fp["mut"]["hash"] != fp["fwd"]["hash"]
    # multiplicity shift at equal row count -> different hash
    assert fp["dupa"]["rows"] == fp["dupb"]["rows"]
    assert fp["dupa"]["hash"] != fp["dupb"]["hash"]


def test_fingerprint_vintage_diff(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fp = {"lineitem": {"rows": 10, "hash": "aa"},
          "orders": {"rows": 5, "hash": "bb"}}

    # bootstrap: no prior artifact carries a fingerprint
    (tmp_path / "SCALE_r07.json").write_text(json.dumps({"keys": {}}))
    v = bench.fingerprint_vintage(fp, "SCALE_r08.json")
    assert v == {"prior": None, "same_vintage": None, "changed_tables": []}

    # same vintage vs the latest fingerprint-bearing prior
    (tmp_path / "SCALE_r08.json").write_text(
        json.dumps({"fixture_fingerprint": {"tables": fp}})
    )
    v = bench.fingerprint_vintage(dict(fp), "SCALE_r09.json")
    assert v["prior"] == "SCALE_r08.json"
    assert v["same_vintage"] is True and v["changed_tables"] == []

    # changed vintage: one table re-rolled, one table added
    newer = {"lineitem": {"rows": 10, "hash": "cc"},
             "orders": {"rows": 5, "hash": "bb"},
             "extra": {"rows": 1, "hash": "dd"}}
    v = bench.fingerprint_vintage(newer, "SCALE_r09.json")
    assert v["same_vintage"] is False
    assert v["changed_tables"] == ["extra", "lineitem"]

    # the artifact being written never diffs against itself
    v = bench.fingerprint_vintage(newer, "SCALE_r08.json")
    assert v["prior"] is None


def test_record_bench_provenance_side_artifact(tmp_path, monkeypatch):
    """Round-8 verdict item 4: the DRIVER bench now records fixture
    provenance too — as a side artifact (the stdout line is length-
    limited by the driver's tail capture; r8's line already overflowed
    it).  Pin: bootstrap run has no verdict, an unchanged fixture
    reads same-vintage, a re-rolled table flips the verdict and names
    the table, and history stays bounded."""
    monkeypatch.chdir(tmp_path)
    d = tmp_path / "sf"
    d.mkdir()

    def write(val):
        pq.write_table(
            pa.table({"k": [1, 2], "v": ["a", val]}),
            str(d / "t.parquet"),
        )

    write("b")
    v1 = bench._record_bench_provenance(str(d), 1.0, {"q": 1.0})
    assert v1["fixture_same_vintage_as_prior"] is None
    assert v1["delta_verdict_counts"] == {"no_prior": 1}

    # +10% on an unchanged fixture: inside the 1.3x floor -> noise
    v2 = bench._record_bench_provenance(str(d), 1.1, {"q": 1.1})
    assert v2["fixture_same_vintage_as_prior"] is True
    assert v2["fixture_changed_tables"] == []
    assert v2["delta_verdict_counts"] == {"noise": 1}
    assert v2["delta_signal_keys"] == {}

    # 2x on an unchanged fixture: beyond every envelope -> SIGNAL
    v2b = bench._record_bench_provenance(str(d), 2.2, {"q": 2.2})
    assert v2b["delta_verdict_counts"] == {"signal": 1}
    assert v2b["delta_signal_keys"] == {"q": 2.0}

    # ...unless the PRIOR run's own same-process repeats already
    # spread that wide — then the envelope widens and 2x is noise
    bench._record_bench_provenance(
        str(d), 1.0, {"q": 1.0}, spread={"q": 2.5}
    )
    v2c = bench._record_bench_provenance(str(d), 2.0, {"q": 2.0})
    assert v2c["delta_verdict_counts"] == {"noise": 1}

    write("X")  # the fixture regenerated between rounds
    v3 = bench._record_bench_provenance(str(d), 1.2, {"q": 1.2})
    assert v3["fixture_same_vintage_as_prior"] is False
    assert v3["fixture_changed_tables"] == ["t"]
    assert v3["delta_verdict_counts"] == {"fixture_changed": 1}

    doc = json.load(open(tmp_path / "BENCH_PROVENANCE.json"))
    assert [r["total"] for r in doc["runs"]] == [1.0, 1.1, 2.2, 1.0, 2.0, 1.2]
    assert doc["runs"][-1]["queries"] == {"q": 1.2}
    # the artifact carries the full per-key classification
    assert doc["runs"][-1]["delta_vs_prior"]["q"]["verdict"] == (
        "fixture_changed"
    )
    # a key absent from the prior run is 'new_key', never 'signal'
    v4 = bench._record_bench_provenance(
        str(d), 2.0, {"q": 1.2, "q_new": 0.8}
    )
    assert v4["delta_verdict_counts"] == {"noise": 1, "new_key": 1}

    # past the envelope but inside the host's measured 1.6x same-code
    # swing ceiling: AMBIGUOUS -> 'watch', not 'signal'
    v5 = bench._record_bench_provenance(
        str(d), 2.0, {"q": 1.74, "q_new": 0.8}
    )  # 1.74/1.2 = 1.45: env 1.3 < ratio < ceiling 1.6
    assert v5["delta_verdict_counts"] == {"watch": 1, "noise": 1}
    assert v5["delta_watch_keys"] == {"q": 1.45}
    assert v5["delta_signal_keys"] == {}

    for i in range(25):  # bounded history
        bench._record_bench_provenance(str(d), 2.0 + i, {"q": 1.0})
    doc = json.load(open(tmp_path / "BENCH_PROVENANCE.json"))
    assert len(doc["runs"]) == 20


def test_delta_verdicts_host_speed_normalization():
    """Round 11 (the r10 q_udf_suite flag): a same-code host slowdown
    is multiplicative across keys, so per-key ratios are classified
    relative to the run-median ratio — but only with >=8 comparable
    keys, and the divisor clamps to [2/3, 1.5] so real many-key
    regressions can't hide behind it."""
    keys = [f"q{i}" for i in range(10)]
    prior = {"queries": {k: 1.0 for k in keys}, "spread": {}}

    # uniform 1.4x slowdown on every key: median-normalized to ~1.0
    d = bench._delta_verdicts(
        {k: 1.4 for k in keys}, {}, prior, same_vintage=True
    )
    assert all(v["verdict"] == "noise" for v in d.values())
    assert all(v["host_speed_ratio"] == 1.4 for v in d.values())
    assert d["q0"]["ratio"] == 1.4 and d["q0"]["host_adj_ratio"] == 1.0

    # ONE key at 2.5x while the rest hold at 1.0: key-specific ->
    # the median is 1.0, no normalization, still SIGNAL
    times = {k: 1.0 for k in keys}
    times["q3"] = 2.5
    d = bench._delta_verdicts(times, {}, prior, same_vintage=True)
    assert d["q3"]["verdict"] == "signal"
    assert sum(v["verdict"] == "signal" for v in d.values()) == 1

    # EVERY key regresses 2.4x (a real global regression): the clamp
    # caps the divisor at 1.5, adj = 1.6 -> still past the envelope
    d = bench._delta_verdicts(
        {k: 2.4 for k in keys}, {}, prior, same_vintage=True
    )
    assert all(v["verdict"] in ("watch", "signal") for v in d.values())

    # under 8 comparable keys the median is too few keys' own ratio:
    # normalization disabled (the single-key pins above stay valid)
    d = bench._delta_verdicts(
        {"a": 1.4, "b": 1.4}, {},
        {"queries": {"a": 1.0, "b": 1.0}}, same_vintage=True,
    )
    assert all(v["verdict"] == "watch" for v in d.values())
    assert "host_speed_ratio" not in d["a"]
