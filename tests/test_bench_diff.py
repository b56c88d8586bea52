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


def test_anchor_mismatch_downgrades_to_suspect(tmp_path, capsys):
    """A NORMALIZED flag whose raw ratio is ~1.0 means the anchor
    moved, not the query (r13 verdict item 2: 12 of the r12->r13
    driver-record flags carried raw 1.0-1.35x while both records
    showed in-run anchor drift) — downgrade to an anchor-mismatch
    suspect: exit 2, A/B still forced, but not a hard fail."""
    old = _record({})
    new = _record({"q050": 1.1})
    # the anchor sped up 0.6x while q050 held at raw 1.1x -> gate 1.83x
    new["calibration_sec"] = new["calibration_end_sec"] = 0.6
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 2, out
    assert "REGRESSION" not in out
    assert "suspect (anchor-mismatch, raw 1.10x)" in out


def test_anchor_mismatch_base_cutoff_without_inrun_drift(tmp_path, capsys):
    """Without in-run anchor drift the raw cutoff stays at 1.2x: a raw
    1.3x query under a 0.6x anchor speedup is a real normalized mover
    and must still hard-fail (the downgrade is not blanket amnesty
    for every norm-only flag)."""
    old = _record({})
    new = _record({"q050": 1.3})
    new["calibration_sec"] = new["calibration_end_sec"] = 0.6
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 1, out
    assert "q050" in out and "REGRESSION" in out


def test_anchor_mismatch_cutoff_widens_under_inrun_drift(tmp_path, capsys):
    """When the tool itself detects >1.15x in-run anchor drift (the
    mechanism that produces norm-only flags in bulk), the raw cutoff
    widens to the observed 1.35x envelope of the r12->r13 artifact
    class: a raw 1.3x flag riding a drifting anchor becomes a suspect
    instead of a hard fail."""
    old = _record({})
    new = _record({"q087": 1.3})
    # start 1.0 -> end 0.5: 2x in-run drift; q087 mid-run normalizes
    # against ~0.75, gating ~1.74x with raw only 1.3x
    new["calibration_end_sec"] = 0.5
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 2, out
    assert "REGRESSION" not in out
    assert "suspect (anchor-mismatch, raw 1.30x)" in out


def test_end_band_flag_downgrades_to_suspect(tmp_path, capsys):
    """A flag positioned AFTER a record's last mid-run probe is
    normalized against an interpolation ending at the single end
    anchor — exactly where sustained-load throttle peaks (the r13
    driver record's end anchor read 2.1x its last probe). Downgrade to
    an end-band suspect (exit 2, A/B forced), symmetric to the
    start-band rule."""
    probes = [[p, 1.0] for p in (10, 25, 50, 75, 100, 125, 150)]
    old = _record({})
    new = _record({"q160": 2.0}, probes=probes)
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 2, out
    assert "REGRESSION" not in out
    assert "suspect (end band, past last probe)" in out
    # the same flag BEFORE the last probe still hard-fails
    new2 = _record({"q100": 2.0}, probes=probes)
    code2, out2 = _run_diff(tmp_path, old, new2, capsys)
    assert code2 == 1, out2
    assert "q100" in out2 and "REGRESSION" in out2


def test_per_name_suspect_waivers(tmp_path, capsys):
    """--allow-suspect NAME waives exactly that suspect (r13 ADVICE:
    the blanket --allow-suspects, re-run after adjudicating one
    round's suspects, also waived any suspect never A/B'd). An
    unwaived suspect keeps exit 2; a stale waiver is reported."""
    old = _record({})
    # two start-band suspects (pos 1 and 2)
    new = _record({"q001": 2.5, "q002": 2.5})
    code, out = _run_diff(tmp_path, old, new, capsys)
    assert code == 2 and out.count("suspect (start band") == 2
    # waiving only one still exits 2, naming the other
    code1, out1 = _run_diff(
        tmp_path, old, new, capsys, "--allow-suspect", "q001"
    )
    assert code1 == 2, out1
    assert "q002" in out1.rsplit("exit 2", 1)[-1]
    # waiving both (comma list) exits 0
    code2, out2 = _run_diff(
        tmp_path, old, new, capsys, "--allow-suspect", "q001,q002"
    )
    assert code2 == 0, out2
    # a stale waiver is called out but does not fail a clean diff
    code3, out3 = _run_diff(
        tmp_path,
        old,
        new,
        capsys,
        "--allow-suspect",
        "q001,q002,q_gone",
    )
    assert code3 == 0, out3
    assert "stale waiver" in out3 and "q_gone" in out3


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
