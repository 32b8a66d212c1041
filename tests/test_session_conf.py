"""Session-builder conf: the AVX pin must be platform-gated (x86-only
HotSpot flag — an unrecognized -XX aborts aarch64 JVM launch, r10 ADVICE)
and applied symmetrically to driver AND executor JVMs (on a real cluster
the SIGSEGV-prone state-store path runs in executors, which
spark.driver.extraJavaOptions never reaches — r10 VERDICT #7). Pure
driver-side logic; no Spark session needed."""

from unittest import mock

from build_a_market_data_etl_strategy_backtesting_engine_spark import (
    session as sess,
)


def test_avx_pin_on_x86():
    for arch in ("x86_64", "AMD64", "amd64"):
        with mock.patch.object(sess.platform, "machine",
                               return_value=arch):
            assert sess._default_jvm_opts() == "-XX:UseAVX=2"


def test_avx_pin_absent_off_x86():
    for arch in ("aarch64", "arm64", "riscv64", "ppc64le"):
        with mock.patch.object(sess.platform, "machine",
                               return_value=arch):
            assert sess._default_jvm_opts() == ""


def test_base_conf_pins_driver_and_executor_symmetrically():
    d = sess._BASE_CONF["spark.driver.extraJavaOptions"]
    e = sess._BASE_CONF["spark.executor.extraJavaOptions"]
    assert d == e  # whatever the platform/env resolved, both JVMs get it


def test_env_overrides_are_separate_knobs(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xdriver")
    monkeypatch.setenv("SPARK_GRAFT_EXECUTOR_JAVA_OPTS", "-Xexec")
    import importlib

    fresh = importlib.reload(sess)
    try:
        assert fresh._BASE_CONF[
            "spark.driver.extraJavaOptions"] == "-Xdriver"
        assert fresh._BASE_CONF[
            "spark.executor.extraJavaOptions"] == "-Xexec"
    finally:
        monkeypatch.delenv("SPARK_GRAFT_DRIVER_JAVA_OPTS")
        monkeypatch.delenv("SPARK_GRAFT_EXECUTOR_JAVA_OPTS")
        importlib.reload(sess)
