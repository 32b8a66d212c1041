"""bench.py self-deferral (r9 VERDICT #2): the committed artifact should
be the comparable one — poll (bounded) for the box to go idle before the
first workload, record the wait in provenance. Pure driver-side logic,
mocked loadavg, no Spark session."""

import importlib.util
import pathlib


def _bench():
    path = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_defer_returns_immediately_on_idle_box():
    b = _bench()
    slept = []
    d = b.defer_until_idle(loadavg=lambda: 0.4, sleep=slept.append)
    assert slept == []
    assert d == {"load1_initial": 0.4, "load1_final": 0.4,
                 "waited_s": 0.0, "gave_up": False}


def test_defer_waits_until_load_clears():
    b = _bench()
    seq = iter([3.7, 3.1, 2.2, 1.2])  # clears on the third poll
    slept = []
    d = b.defer_until_idle(loadavg=lambda: next(seq),
                           sleep=slept.append, poll_s=5.0,
                           max_wait_s=180.0)
    assert slept == [5.0, 5.0, 5.0]
    assert d["load1_initial"] == 3.7
    assert d["load1_final"] == 1.2
    assert d["waited_s"] == 15.0
    assert d["gave_up"] is False


def test_defer_gives_up_at_the_bound_and_never_oversleeps():
    b = _bench()
    slept = []
    d = b.defer_until_idle(loadavg=lambda: 4.0, sleep=slept.append,
                           poll_s=7.0, max_wait_s=20.0)
    # last step is clipped to the remaining budget, never past it
    assert slept == [7.0, 7.0, 6.0]
    assert sum(slept) == 20.0
    assert d["gave_up"] is True
    assert d["waited_s"] == 20.0
    assert d["load1_final"] == 4.0


def test_preflight_samples_load_after_deferral_before_calibration():
    """r10 VERDICT #2: the contamination gate must read AMBIENT load —
    sampled immediately after the deferral returns and before any other
    work (the old placement, after the 32-core session spin-up + warm-up
    passes, gated on the bench's own heat: deferral exited at 1.43,
    load_start read 3.89)."""
    b = _bench()
    order = []

    def defer():
        order.append("defer")
        return {"waited_s": 0.0, "gave_up": False,
                "load1_initial": 0.1, "load1_final": 0.1}

    def load1():
        order.append("load1")
        return 0.42

    def calibrate():
        order.append("calibrate")
        return {"sha256_mb_per_s_1t": 1.0}

    deferral, load_start, calibration = b.preflight(
        defer=defer, load1=load1, calibrate=calibrate)
    assert order == ["defer", "load1", "calibrate"]
    assert load_start == 0.42
    assert deferral["gave_up"] is False
    assert calibration == {"sha256_mb_per_s_1t": 1.0}


def test_main_source_orders_preflight_before_spark_and_keeps_fields():
    """Belt-and-braces on the wiring main() itself: preflight() is called
    before get_spark(), and provenance carries the split fields —
    load1_start (the gate) and load1_post_warmup (the bench's own heat,
    informational only)."""
    import pathlib

    src = (pathlib.Path(__file__).resolve().parents[1] / "bench.py"
           ).read_text()
    body = src.split("def main():", 1)[1]
    assert body.index("preflight()") < body.index("get_spark(")
    assert '"load1_post_warmup"' in body
    assert '"calibration": calibration' in body
    # the gate consumes the preflight sample, nothing later reassigns it
    assert body.count("load_start =") == 0  # unpacked from preflight only


def test_box_calibration_shape_and_threads():
    b = _bench()

    class _NullHash:
        def update(self, _buf):
            pass

    cal = b.box_calibration(reps=1, mb=1, hasher=_NullHash)
    # r13: + the second (memcpy) probe — ADDITIVE keys only, the sha256
    # fields the normalization reads are untouched
    assert set(cal) == {"sha256_mb_per_s_1t", "sha256_mb_per_s_all",
                        "threads",
                        "memcpy_mb_per_s_1t", "memcpy_mb_per_s_all"}
    import os
    assert cal["threads"] == os.cpu_count()
    assert cal["sha256_mb_per_s_1t"] > 0
    assert cal["sha256_mb_per_s_all"] > 0
    assert cal["memcpy_mb_per_s_1t"] > 0
    assert cal["memcpy_mb_per_s_all"] > 0


def test_defer_target_sits_below_contamination_threshold():
    b = _bench()
    # hysteresis: a run released at the target must not immediately trip
    # the contamination flag
    assert b.LOAD1_IDLE_TARGET < b.LOAD1_CONTAMINATION_THRESHOLD
    assert not b._contaminated(b.LOAD1_IDLE_TARGET)
