"""The driver's BENCH capture keeps only the LAST 2000 characters of
stdout and json-parses the final line in that window. BENCH_r04 and
BENCH_r05 both recorded ``parsed: None`` because the full result line
(100+ queries) outgrew the window. bench._tail_safe_line guarantees
the printed line fits while the complete result goes to
bench_last.json — these tests pin that contract.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

DRIVER_TAIL_CHARS = 2000


def _fake_result(n_queries: int) -> dict:
    queries = {name: 0.123 for name in bench.HEADLINE[:n_queries]}
    # pad with synthetic long names beyond the real headline if needed
    for i in range(max(0, n_queries - len(bench.HEADLINE))):
        queries[f"synthetic_query_with_a_rather_long_name_{i:04d}"] = 1.234
    total = round(sum(queries.values()), 3)
    return {
        "metric": "headline_total_wall",
        "value": total,
        "total_timed": total,
        "n_timed": len(queries),
        "n_queries": len(queries),
        "n_runs": 3,
        "unit": "sec",
        "queries": queries,
        "run_totals": [total, total, total],
        "errors": {},
        "sf": 0.1,
    }


def test_line_fits_driver_tail_at_current_headline_size():
    result = _fake_result(len(bench.HEADLINE))
    line = bench._tail_safe_line(result)
    assert len(line) <= DRIVER_TAIL_CHARS - 1  # room for the newline
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total_wall"
    assert parsed["value"] == result["value"]
    assert parsed["n_timed"] == len(result["queries"])
    # the recorded-baseline queries (front of HEADLINE) survive the cut
    for name in bench.HEADLINE[:14]:
        assert name in parsed["queries"], name
    assert parsed["queries_omitted"] == len(result["queries"]) - len(
        parsed["queries"]
    )


def test_line_fits_even_at_300_queries():
    result = _fake_result(300)
    line = bench._tail_safe_line(result)
    assert len(line) <= DRIVER_TAIL_CHARS - 1
    parsed = json.loads(line)
    assert parsed["queries_omitted"] > 0
    assert parsed["full"] == "bench_last.json"


def test_pathological_errors_are_truncated():
    result = _fake_result(50)
    result["errors"] = {f"q{i}": "x" * 5000 for i in range(40)}
    result["value"] = None
    line = bench._tail_safe_line(result)
    assert len(line) <= DRIVER_TAIL_CHARS - 1
    json.loads(line)


def test_memo_peers_expand_noisy_subset():
    """ADVICE r5 item 2: a noisy star-memo query's subset pass includes
    its memo-sharing peers so the one-time build cost lands where it
    lands in a full pass."""
    out = bench._with_memo_peers({"bi_monthly_trend"})
    assert {"fact_orders", "star_wide", "bi_top15_employers"} <= out
    # non-memo queries expand to themselves only
    assert bench._with_memo_peers({"text_stats"}) == {"text_stats"}
