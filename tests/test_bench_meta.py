"""bench.py round-over-round machinery: the driver records only the
last 2000 chars of stdout, so the delta base selection has to survive
unparseable rounds and both recorded formats (legacy full per-query
timings vs the r10+ compact subtotals line). These pins guard next
round's evidence file, not query behavior."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _write(tmp_path, n, parsed):
    (tmp_path / f"BENCH_r{n:02d}.json").write_text(
        json.dumps({"n": n, "rc": 0, "tail": "", "parsed": parsed})
    )


def test_unparsed_round_falls_back_to_older(tmp_path):
    _write(tmp_path, 8, {"queries": {"q1": 1.0, "q2": 2.0},
                         "subtotals": {"headline13": 3.0}})
    _write(tmp_path, 9, None)  # the r9 overflow shape
    tag, pp = bench._prev_round(str(tmp_path))
    assert tag == "r08"
    assert pp["subtotals"] == {"headline13": 3.0}


def test_compact_format_not_mistaken_for_per_query(tmp_path):
    # r10+ shape: `queries` IS the subtotal dict — main() must not
    # compute a per-query "common" delta from it (handled by the
    # "headline13 in pq" guard; here we pin that the round is still
    # SELECTED and its subtotals usable)
    _write(tmp_path, 10, {
        "queries": {"headline13": 9.3, "pre_r6": 24.0, "full": 88.0},
        "subtotals": {"headline13": 9.3, "pre_r6": 24.0, "full": 88.0},
    })
    tag, pp = bench._prev_round(str(tmp_path))
    assert tag == "r10"
    assert pp["subtotals"]["headline13"] == 9.3
    assert "headline13" in pp["queries"]  # the guard input


def test_no_usable_round_returns_none(tmp_path):
    _write(tmp_path, 7, None)
    assert bench._prev_round(str(tmp_path)) is None
    assert bench._prev_round(str(tmp_path / "empty")) is None


def test_r12_compact_format_without_subtotals_key(tmp_path):
    # r12 on: the final line drops the duplicated `subtotals` key to
    # restore the <300-byte tail-survival margin — `queries` IS the
    # subtotal dict and the delta base derives psub from it
    _write(tmp_path, 12, {
        "queries": {"headline13": 9.3, "pre_r6": 24.0, "full": 88.0},
    })
    tag, pp = bench._prev_round(str(tmp_path))
    assert tag == "r12"
    assert pp["queries"]["headline13"] == 9.3
    # simulate main()'s delta-base extraction on this shape
    pq = dict(pp.get("queries", {}))
    psub = dict(pp.get("subtotals") or {})
    if "headline13" in pq:
        if not psub:
            psub = dict(pq)
        pq = {}
    assert psub["headline13"] == 9.3 and pq == {}
