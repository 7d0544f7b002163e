"""The stdout JSON line must fit the driver's ~2000-char tail window.

Round 4's line carried every scaling receipt inline, grew to 2.2k chars,
and the round's BENCH row recorded ``parsed: null`` — the run had met
the north-rule bar (median pair efficiency 0.808) and the evidence was
lost to a parse failure.  These tests pin the size contract on a
worst-case payload (all baselined queries flagged as regressions, three
pair rows with per-run receipts, all four local rows, the pinned
sensitivity pair) without starting Spark.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _worst_case_full() -> dict:
    queries = {
        name: 123.456
        for name in list(bench.QUERY_BASELINES) + ["extract_e2e", "extract_rep360"]
    }
    regressions = {
        name: {"sec": 123.456, "baseline_sec": base}
        for name, base in bench.QUERY_BASELINES.items()
    }
    regressions["_window"] = {
        "kernel_1core_docs_per_sec": 6700.8,
        "clean_reference": 8200,
    }
    local = {
        "sec": 107.26,
        "docs_per_sec": 16781.7,
        "mb_per_sec": 12.31,
        "steal_pct": 0.29,
        "jvm_cpus": "0-31",
        "runs": [{"sec": 107.26, "steal_pct": 0.29}] * 2,
    }
    pair = {
        "local4_sec": 114.72,
        "local16_sec": 36.22,
        "local16_runs": [36.2, 36.24],
        "steal4": 0.41,
        "steal16": 0.43,
        "window_ceiling": 0.812,
        "kernel_1core": 5821.7,
        "efficiency": 0.792,
        "normalized": 0.975,
        "repaired": True,
    }
    scaling = {f"local{c}": dict(local) for c in (4, 8, 16, 32)}
    scaling.update(
        {
            "pairs_4_to_16": [dict(pair)] * 3,
            "efficiency_4_to_16": 0.808,
            "machine_ceiling_4_to_16": 0.971,
            "kernel_1core_docs_per_sec": 6531.8,
            "normalized_4_to_16": 0.922,
            "efficiency_8_to_32": 0.642,
            "machine_ceiling_8_to_32": 0.70,
            "normalized_8_to_32": 0.917,
            "pinned_4_to_16": {
                "local4": dict(local),
                "local16": dict(local),
                "efficiency": 0.76,
            },
            "north_rule_protocol": "x" * 480,
            "north_rule_efficiency": 0.808,
        }
    )
    return {
        "metric": "extract_e2e_sec",
        "value": 1.234,
        "unit": "sec",
        "queries": queries,
        "regressions": regressions,
        "sf": "0.1",
        "throughput": {
            "n_docs": 1800000,
            "mb": 1320.0,
            "docs_per_sec": 77684.9,
            "mb_per_sec": 56.97,
        },
        "scaling": scaling,
    }


def test_compact_line_fits_driver_tail():
    line = bench.compact_line(_worst_case_full())
    assert len(line) <= 1900, len(line)
    d = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf", "throughput"):
        assert key in d, key
    # the north-rule headline numbers must survive compaction
    assert d["scaling"]["efficiency_4_to_16"] == 0.808
    assert d["scaling"]["north_rule_efficiency"] == 0.808
    assert d["scaling"]["local4"] == {"sec": 107.26, "docs_per_sec": 16781.7}
    assert d["scaling"]["local16"]["docs_per_sec"] == 16781.7
    assert "normalized_4_to_16" in d["scaling"]


def test_compact_line_no_scaling_section():
    full = _worst_case_full()
    full["scaling"] = {}
    line = bench.compact_line(full)
    assert len(line) <= 1900
    assert json.loads(line)["scaling"] == {}


def test_round4_shaped_payload_would_have_parsed():
    """The exact failure mode: a payload at the round-4 receipt density
    must compact to well under the 2000-char tail."""
    line = bench.compact_line(_worst_case_full())
    # leave >=100 chars of interleave slack inside a 2000-char tail
    assert len(line) <= 1900


def _pair(eff: float, steal4: float = 0.0, steal16: float = 0.0) -> dict:
    return {"efficiency": eff, "steal4": steal4, "steal16": steal16}


def test_pair_median_steal_gating():
    """Ledger run 34: one steal-wrecked pair must not halve the median.

    Steal% is an external /proc/stat receipt, so a pair with a >=5%
    side is a provably contaminated measurement; the median runs over
    the steal-clean pairs when any exist, over all pairs otherwise."""
    # run-34 shape: clean 0.813 pair + a 17.71%-steal 0.318 pair
    med, excl = bench._pair_median(
        [_pair(0.813, 0.02, 0.08), _pair(0.318, 0.12, 17.71)]
    )
    assert (med, excl) == (0.813, 1)
    # run-29 shape: BOTH pairs stolen -> no clean evidence, use all
    med, excl = bench._pair_median(
        [_pair(0.553, 0.1, 9.49), _pair(0.717, 0.2, 5.45)]
    )
    assert (med, excl) == (0.635, 0)
    # all-clean pairs: plain median, nothing excluded (odd + even counts)
    med, excl = bench._pair_median(
        [_pair(0.88, 0.1, 0.1), _pair(0.92), _pair(0.80)]
    )
    assert (med, excl) == (0.88, 0)
    med, excl = bench._pair_median([_pair(0.9), _pair(0.8)])
    assert (med, excl) == (0.85, 0)
    # the 4-side's steal gates too, and 5.0 is the exclusive boundary
    med, excl = bench._pair_median([_pair(0.3, 5.0, 0.0), _pair(0.9)])
    assert (med, excl) == (0.9, 1)
    med, excl = bench._pair_median([_pair(0.3, 4.99, 0.0), _pair(0.9)])
    assert (med, excl) == (0.6, 0)


def test_compact_line_carries_steal_exclusion_receipt():
    full = _worst_case_full()
    full["scaling"]["steal_excluded_pairs"] = 1
    line = bench.compact_line(full)
    assert len(line) <= 1900
    assert json.loads(line)["scaling"]["steal_excluded_pairs"] == 1
