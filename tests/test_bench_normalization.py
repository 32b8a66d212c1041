"""Calibration-normalized bench totals (r11 VERDICT #4): the committed
calibration constant exists so cross-round comparisons need no hand
arithmetic — normalized_total must rescale in the CORRECT direction
(a slower box state inflates wall totals, so normalizing multiplies by
cal_run / cal_ref, shrinking them back) and the history tool must read
totals out of both raw bench JSON and the driver's wrapped artifacts."""

import json

from bench import CAL_REF_ALL_MB_S, normalized_total


def test_slower_box_normalizes_down():
    # box at half the reference speed -> measured total is ~2x inflated
    # -> normalized total must come back DOWN to ~the true figure
    cal = {"sha256_mb_per_s_all": CAL_REF_ALL_MB_S / 2}
    assert normalized_total(20.0, cal) == 10.0


def test_faster_box_normalizes_up():
    cal = {"sha256_mb_per_s_all": CAL_REF_ALL_MB_S * 2}
    assert normalized_total(10.0, cal) == 20.0


def test_reference_box_is_identity():
    cal = {"sha256_mb_per_s_all": CAL_REF_ALL_MB_S}
    assert normalized_total(10.396, cal) == 10.396


def test_missing_calibration_is_none():
    assert normalized_total(10.0, {}) is None
    assert normalized_total(10.0, None) is None
    assert normalized_total(10.0, {"sha256_mb_per_s_all": 0}) is None


def test_r11_live_catch_normalizes_within_noise():
    """The r11 same-day pair the constant was added for: 10.686 s at
    cal 26,258 (idle) vs 11.306 s at cal ~26,258*0.66 would normalize
    the loaded run DOWN; with the actual measured 34% all-threads drop
    the normalized figures land within the same-day noise band instead
    of reading as a 6% regression."""
    idle = normalized_total(10.686, {"sha256_mb_per_s_all": 26258.0})
    shifted = normalized_total(11.306,
                               {"sha256_mb_per_s_all": 26258.0 * 0.66})
    assert idle is not None and shifted is not None
    assert shifted < idle  # the box-state penalty is removed, not doubled


def test_history_tool_reads_wrapped_and_raw(tmp_path):
    from tools.bench_history import rows

    raw = {"value": 10.0, "provenance": {
        "contaminated": False,
        "calibration": {"sha256_mb_per_s_all": CAL_REF_ALL_MB_S}}}
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(raw))
    wrapped = {"n": 2, "rc": 0, "parsed": raw}
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(wrapped))
    got = list(rows(str(tmp_path)))
    assert [r[0] for r in got] == ["r01", "r02"]
    for _rnd, total, cont, cal, norm, _note in got:
        assert total == 10.0 and cont is False
        assert cal == CAL_REF_ALL_MB_S and norm == 10.0
