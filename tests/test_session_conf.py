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
    if d:
        # the executor side carries the SAME pin, but prefixed with
        # IgnoreUnrecognizedVMOptions (r11 ADVICE): the platform gate
        # samples the DRIVER arch only — on a mixed-arch cluster an
        # aarch64 executor must ignore the x86-only flag, not abort
        assert e == f"-XX:+IgnoreUnrecognizedVMOptions {d}"
    else:
        assert e == ""


def test_executor_opts_tolerant_on_mixed_arch_cluster():
    """An aarch64 JVM launched with the executor option string must not
    see a bare unrecognized -XX flag: IgnoreUnrecognizedVMOptions has to
    come FIRST (HotSpot applies it to subsequent options)."""
    import importlib

    with mock.patch.object(sess.platform, "machine",
                           return_value="x86_64"):
        fresh = importlib.reload(sess)
        e = fresh._BASE_CONF["spark.executor.extraJavaOptions"]
        assert e.split()[0] == "-XX:+IgnoreUnrecognizedVMOptions"
        assert "-XX:UseAVX=2" in e
        # the driver keeps the bare pin: a loud failure where we KNOW
        # the arch is the one the pin targets
        assert fresh._BASE_CONF[
            "spark.driver.extraJavaOptions"] == "-XX:UseAVX=2"
    importlib.reload(sess)


def test_extra_conf_empty_string_reaches_builder():
    """get_spark's empty-value skip is scoped to _BASE_CONF's
    platform-gated keys (r11 ADVICE): a user-supplied empty string in
    extra_conf is an intentional value (clearing a Spark default) and
    must survive to the builder's conf map."""
    captured = {}

    class FakeBuilder:
        def appName(self, *_):
            return self

        def master(self, *_):
            return self

        def config(self, k, v):
            captured[k] = v
            return self

        def getOrCreate(self):
            raise RuntimeError("stop-before-jvm")

    with mock.patch.object(
            sess.SparkSession, "builder", FakeBuilder()):
        try:
            sess.get_spark("t", extra_conf={"spark.test.flag": ""})
        except RuntimeError:
            pass
    assert captured.get("spark.test.flag") == ""


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
