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


def test_defer_target_sits_below_contamination_threshold():
    b = _bench()
    # hysteresis: a run released at the target must not immediately trip
    # the contamination flag
    assert b.LOAD1_IDLE_TARGET < b.LOAD1_CONTAMINATION_THRESHOLD
    assert not b._contaminated(b.LOAD1_IDLE_TARGET)
