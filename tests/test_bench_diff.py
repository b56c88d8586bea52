"""Unit tests for tools/bench_diff.py's drift model (pure Python, no
Spark): piecewise anchor interpolation over start+probes+end and the
sliding-window noise detector added in r12. The motivating exhibit is
the r11 driver record, where a contiguous position-110-144 host-noise
block produced 11 of the round's 12 >2x flags — the detector must
downgrade exactly that shape to window-suspects while a genuine
isolated regression still hard-fails the gate."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench_diff",
    Path(__file__).resolve().parent.parent / "tools" / "bench_diff.py",
)
bench_diff = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_diff)

N = 174


def _record(times: dict[str, float], probes=None) -> dict:
    names = [f"q{i:03d}" for i in range(N)]
    queries = {n: times.get(n, 1.0) for n in names}
    return {
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "calibration_sec": 1.0,
        "calibration_end_sec": 1.0,
        **({"calibration_probes": probes} if probes is not None else {}),
        "order": names,
        "queries": queries,
        "samples": {n: 3 for n in names},
        "sf": 0.1,
    }


def _run_diff(
    tmp_path, old: dict, new: dict, capsys, *extra: str
) -> tuple[int, str]:
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    argv = sys.argv
    sys.argv = [
        "bench_diff.py", str(po), str(pn), "--threshold", "1.5", *extra
    ]
    try:
        code = bench_diff.main()
    finally:
        sys.argv = argv
    return code, capsys.readouterr().out


def test_contiguous_noise_window_downgrades_to_suspect(tmp_path, capsys):
    """A 26-position block uniformly inflated 2.5x (the r11 shape) must
    be reported as a NOISE WINDOW — environment, not code — but exit 2
    (r12 ADVICE: suspects force adjudication, they are not amnesty)."""
    old = _record({})
    new = _record({f"q{i:03d}": 2.5 for i in range(110, 136)})
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert "NOISE WINDOW" in out
    assert code == 2, out
    assert "REGRESSION" not in out
    assert "suspect (noise window)" in out
    # after adjudication, --allow-suspects waives them explicitly
    code2, out2 = _run_diff(tmp_path, old, new, capsys, "--allow-suspects")
    assert code2 == 0, out2


def test_start_band_flag_downgrades_to_suspect(tmp_path, capsys):
    """A >threshold flag in the first 5 positions of either record is a
    start-band suspect (exit 2), not a hard regression: the r11 (pos 0)
    and r12 (pos 1) driver records both produced their only hard drift
    flag there — a cold-start artifact class the single start anchor
    cannot normalize."""
    old = _record({})
    new = _record({"q001": 2.5})
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 2, out
    assert "REGRESSION" not in out
    assert "suspect (start band" in out


def test_micro_window_downgrades_to_suspect(tmp_path, capsys):
    """>=3 CONTIGUOUS flagged positions with an extreme local median —
    the r13 end-of-round shape (positions 104-106 at raw
    2.3x/5.1x/6.1x, all A/B'd code-neutral) — are a micro host spike:
    the timed order is a seeded random permutation, so adjacent
    positions share no code. Downgrade to suspects (exit 2, A/B
    forced), never a hard fail."""
    old = _record({})
    new = _record({"q104": 2.3, "q105": 5.1, "q106": 6.1})
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert "NOISE WINDOW" in out
    assert code == 2, out
    assert "REGRESSION" not in out
    assert out.count("suspect (noise window)") == 3


def test_two_adjacent_flags_still_hard_fail(tmp_path, capsys):
    """Two adjacent flags don't meet the >=3-contiguous micro-window
    bar — they stay hard regressions (the detector must not blanket-
    amnesty small clusters)."""
    old = _record({})
    new = _record({"q104": 2.3, "q105": 5.1})
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 1, out
    assert out.count("REGRESSION") == 2


def test_isolated_regression_still_hard_fails(tmp_path, capsys):
    """One genuinely regressed query outside any window keeps failing
    the gate — the detector must not blanket-amnesty everything."""
    old = _record({})
    new = _record({"q050": 2.1})
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert "NOISE WINDOW" not in out
    assert code == 1
    assert "q050" in out and "REGRESSION" in out


def test_probe_anchors_normalize_mid_run_drift(tmp_path, capsys):
    """A query sitting on a probe-documented slow segment is normalized
    by the interpolated anchor instead of flagged: raw ratio 1.9 at a
    position whose anchors bracket ~1.6x drift gates at ~1.19."""
    old = _record({})
    new = _record(
        {"q060": 1.9},
        probes=[[25, 1.0], [50, 2.0], [75, 1.0], [100, 1.0],
                [125, 1.0], [150, 1.0]],
    )
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 0, out
    for line in out.splitlines():
        if line.startswith("q060"):
            assert "REGRESSION" not in line and "suspect" not in line
            break
    else:
        pytest.fail("q060 row missing from diff output")


def test_anchor_interpolation_is_piecewise():
    """cal_at must interpolate linearly BETWEEN the bracketing anchors,
    not between start and end globally (both 1.0 here — the global
    model would report no drift anywhere)."""
    rec = _record({}, probes=[[50, 2.0], [100, 1.0]])
    assert bench_diff.cal_at(rec, "q075") == pytest.approx(1.5)
    assert bench_diff.cal_at(rec, "q050") == pytest.approx(2.0)
    assert bench_diff.cal_at(rec, "q000") == pytest.approx(1.0)
    assert bench_diff.cal_at(rec, "q173") == pytest.approx(1.0)
    # pre-r12 record (no probes): falls back to start/end interpolation
    legacy = _record({})
    assert bench_diff.cal_at(legacy, "q075") == pytest.approx(1.0)
    # pre-r9 record (no order/end): record-level anchor
    oldest = {"calibration_sec": 1.3, "queries": {"q0": 1.0}}
    assert bench_diff.cal_at(oldest, "q0") == pytest.approx(1.3)
