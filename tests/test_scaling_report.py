"""Pure unit tests for the scaling-report generator (bench.py's
write_scaling_report + _slim_scaling) — the code that turns the raw
run ledger into BENCH/BASELINE.md, BENCH/scaling.json, and the slim
block every per-round bench line carries. Three rounds of measurement
disputes (single-shot headline, stale criterion number, dropped
scale_series) all traced to this layer, so its selection rules are
pinned here without spinning up Spark: host probes are stubbed and
`prior_runs` bypasses fresh measurement.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _run(cpus, docs, wall, steal=0.1, stages=None):
    return {"cpus": cpus, "docs": docs, "wall_sec": float(wall),
            "docs_per_sec": round(docs / wall, 1), "rows_out": docs,
            "steal_sec": steal,
            "stages": stages or {"signatures": wall / 2, "edges": wall / 4}}


LEDGER = [
    # window A: interleaved 4/16 at 800k — the primary protocol
    _run(4, 800_000, 200.0),
    _run(16, 800_000, 80.0),
    # window B: a faster 4-core run WITHOUT an adjacent 16 (cross-window
    # minima must feed the headline min-of-N but never form a pair)
    _run(4, 800_000, 100.0),
    # window C: supplementary 1/4 pair
    _run(1, 800_000, 800.0),
    _run(4, 800_000, 250.0),
    # window D: original 8/32 pair
    _run(8, 800_000, 120.0),
    _run(32, 800_000, 40.0),
    # data-size points at both primary levels
    _run(4, 1_600_000, 380.0),
    _run(16, 1_600_000, 140.0),
]


def _write_report(tmp_path, runs=LEDGER, monkeypatch=None):
    monkeypatch.setattr(bench, "host_parallel_ceiling", lambda lo, hi: {
        "ceiling": 0.75, "cpu_ceiling": 0.75, "mem_ceiling": 0.4,
        "mem_lo_units_per_sec": 4.0, "mem_hi_units_per_sec": 6.0})
    monkeypatch.setenv("SPARK_GRAFT_SCALING_ORIG", "0")
    monkeypatch.delenv("SPARK_GRAFT_SCALING_LEVELS", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_SCALING_DOCS", raising=False)
    path = str(tmp_path / "BASELINE.md")
    out = bench.write_scaling_report(path=path, prior_runs=list(runs))
    return out, path


def test_headline_is_min_of_n_across_windows(tmp_path, monkeypatch):
    """The headline lo/hi are the fastest run per level at the primary
    (levels, docs) cell across ALL windows — 100 s, not window A's
    200 s — and efficiency uses them."""
    out, _ = _write_report(tmp_path, monkeypatch=monkeypatch)
    assert out["lo"]["wall_sec"] == 100.0
    assert out["hi"]["wall_sec"] == 80.0
    want = (out["hi"]["docs_per_sec"] / out["lo"]["docs_per_sec"]) / 4
    assert abs(out["efficiency"] - round(want, 3)) < 1e-9


def test_pairs_are_same_window_adjacent_only(tmp_path, monkeypatch):
    """Supplementary/original pair efficiencies come only from ADJACENT
    (lo, hi) ledger entries — the fast cross-window 4-core run (100 s)
    must not pair with window A's 16-core run."""
    out, _ = _write_report(tmp_path, monkeypatch=monkeypatch)
    sup = out["supplementary_protocols"]
    assert set(sup) == {"1_4"}
    assert sup["1_4"]["lo"]["wall_sec"] == 800.0
    assert sup["1_4"]["hi"]["wall_sec"] == 250.0  # adjacent, not the 100s run
    assert sup["1_4"]["efficiency"] == round((800.0 / 250.0) / 4, 3)
    assert out["original_protocol_8_32"]["efficiency"] == round(
        (120.0 / 40.0) / 4, 3)


def test_size_series_best_run_per_cell(tmp_path, monkeypatch):
    """The weak-scaling table takes the best run per (cpus, docs) cell
    and only emits levels with >= 2 sizes (cpus 1/8/32 have one size
    each and must not appear)."""
    out, path = _write_report(tmp_path, monkeypatch=monkeypatch)
    ss = out["size_series"]
    assert set(ss) == {"4", "16"}
    assert ss["4"]["800000"]["wall_sec"] == 100.0
    assert ss["4"]["1600000"]["wall_sec"] == 380.0
    with open(path) as f:
        md = f.read()
    assert "| local[4] | 1600000 | 380.0 |" in md


def test_report_md_carries_series_and_raw_runs(tmp_path, monkeypatch):
    """The generated markdown leads with every same-window pair series
    value and publishes every raw run with its steal column."""
    out, path = _write_report(tmp_path, monkeypatch=monkeypatch)
    with open(path) as f:
        md = f.read()
    assert "1/4 = 0.800" in md  # (3200/800)/4 ... from the 800/250 pair
    assert f"4/16 = {out['efficiency']:.3f}" in md
    assert md.count("| local[") >= len(LEDGER)  # raw-run table complete
    # scaling.json written next to the report with the same payload
    with open(tmp_path / "scaling.json") as f:
        assert json.load(f)["efficiency"] == out["efficiency"]


def test_slim_scaling_block(tmp_path, monkeypatch):
    """The per-round bench line's scaling block: headline scalars +
    per-level one-liners + compact series, and never the raw-run list
    or per-stage payloads (round-2's line got truncated into an
    unparseable artifact carrying those)."""
    out, _ = _write_report(tmp_path, monkeypatch=monkeypatch)
    slim = bench._slim_scaling(out)
    assert slim["efficiency"] == out["efficiency"]
    assert "runs" not in slim and "stages" not in slim["lo"]
    assert slim["supplementary"]["1_4"]["efficiency"] == 0.8
    assert slim["size_series"]["16"]["1600000"] == round(
        1_600_000 / 140.0, 1)
    assert len(json.dumps(slim)) < 4000
