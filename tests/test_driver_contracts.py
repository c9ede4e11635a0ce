"""Import/shape smoke tests for the two driver contract files.

``bench.py`` and ``__graft_entry__.py`` are executed by the build
driver, not by the library — so an import-time break (a renamed helper,
a moved module) would otherwise surface only in the driver's final
benchmark run, where it silently costs the round's recorded number.
These tests run the cheap CPU-sized versions of both entry points.

(The suite is invoked from the repo root — ``python -m pytest tests/``
— so the repo root is on ``sys.path`` and both top-level files import
directly.)
"""
import jax
import numpy as np


def test_bench_imports_and_probe_runs_tiny():
    import bench

    # tiny configuration in Pallas interpret mode: exercises both the
    # XLA and Pallas probe graphs end-to-end on CPU (the reported
    # Top/s values are meaningless at this size — only finiteness and
    # positivity are contractual)
    xla_tops, pallas_tops = bench._capacity_probe(K=4, ITERS=8,
                                                  interpret=True)
    assert np.isfinite(xla_tops) and xla_tops > 0
    assert np.isfinite(pallas_tops) and pallas_tops > 0
    # the headline constants the driver relies on
    assert bench.BASELINE_GINT == 124.0
    assert callable(bench.main)


def test_bench_config_selection():
    """Healthy probe -> tuned default only; degraded -> the full
    allocation-dependent trial set (docs/performance.md variance)."""
    import bench

    healthy = bench._pick_configs(2.8, 2.8)
    assert healthy == bench.TILE_CONFIGS[:1]
    # round-3 degraded allocation signature: XLA near-full, Pallas ~1.0
    degraded = bench._pick_configs(2.3, 0.99)
    assert degraded == bench.TILE_CONFIGS
    # absolute floor: both probes low (whole-chip contention)
    assert bench._pick_configs(1.0, 0.9) == bench.TILE_CONFIGS
    # every trial config must be a valid DirectGravity (impl,
    # tile_config, extra solver kwargs); a band_rows ``...`` placeholder
    # stands for the measured width and resolves to an int in main()
    from nbody_streams_tpu.ops.dispatch import DirectGravity

    for name, impl, tile, extra in bench.TILE_CONFIGS:
        kw = dict(extra or {})
        # consumed by _resolve_config_kwargs, never reaches the solver
        kw.pop("band_slack", None)
        if kw.get("band_rows") is ...:
            assert impl == "xla", name  # only the xla backend takes it
            kw["band_rows"] = 20
        s = DirectGravity(np.ones(8), np.full(8, 0.05),
                          impl="jnp" if impl == "auto" else impl, **kw,
                          tile_config=tile)
        assert s.tile_config == tile, name


def test_bench_resolves_measured_band_placeholder():
    """The ``...`` band_rows placeholder in the xla-mb configs resolves
    to measured-width + BAND_SLACK against the actual ICs, and a
    placeholder-free config passes through untouched."""
    import bench
    from nbody_streams_tpu.ops.xla_direct import measure_band_rows

    rng = np.random.default_rng(3)
    pos = rng.normal(0, 1.0, (8192, 3))
    soft = np.full(8192, 0.05)
    kw = bench._resolve_config_kwargs(
        {"block_size": 2048, "band_rows": ...}, pos, soft)
    assert kw["band_rows"] == measure_band_rows(
        pos, soft, bs=2048) + bench.BAND_SLACK
    assert isinstance(kw["band_rows"], int)
    assert bench._resolve_config_kwargs(None, pos, soft) == {}
    assert bench._resolve_config_kwargs({"block_size": 4096}, pos,
                                        soft) == {"block_size": 4096}
    # row_size threads into the measurement and scales the slack floor
    # (same physical cushion as the rs=512 configs: BAND_SLACK*512
    # sources); target_block selects the window-measurement tile
    kw = bench._resolve_config_kwargs(
        {"block_size": 4096, "band_rows": ..., "row_size": 128,
         "target_block": 512},
        pos, soft)
    assert kw["row_size"] == 128
    assert kw["band_rows"] == measure_band_rows(
        pos, soft, bs=512, rs=128) + (bench.BAND_SLACK * 512) // 128


def test_bench_supervisor_passes_through_child_json(capfd):
    """Healthy child: its stdout JSON reaches the supervisor's stdout."""
    import sys

    import bench

    rc = bench._supervised([sys.executable, "-c",
                            "print('{\"value\": 1.0}')"])
    assert rc == 0
    assert '{"value": 1.0}' in capfd.readouterr().out


def test_bench_supervisor_kills_wedged_child_and_retries(monkeypatch,
                                                         capfd):
    """A child that never returns (axon tunnel wedge) is killed at the
    deadline; after the retry also wedges the supervisor gives up with
    rc=1 instead of hanging the driver's bench slot."""
    import sys
    import time

    import bench

    monkeypatch.setenv("NBODY_BENCH_TIMEOUT_S", "1")
    t0 = time.perf_counter()
    rc = bench._supervised([sys.executable, "-c",
                            "import time; time.sleep(600)"])
    elapsed = time.perf_counter() - t0
    assert rc == 1
    assert elapsed < 30  # two 1 s deadlines, not a hang
    err = capfd.readouterr().err
    assert "killing child" in err and "retrying once" in err


def test_bench_supervisor_retries_failed_child(capfd):
    """Non-zero child exit (e.g. _require_device abort) is retried, and
    a second failure yields rc=1 with no stdout (no fake JSON line)."""
    import sys

    import bench

    rc = bench._supervised([sys.executable, "-c",
                            "import sys; sys.exit(3)"])
    assert rc == 1
    out, err = capfd.readouterr()
    assert out == ""
    assert err.count("rc=3") == 2


def test_graft_entry_single_step_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    pos = np.asarray(out.pos)
    assert pos.shape == args[0].pos.shape
    assert np.isfinite(pos).all()
    # one KDK step at dt=2e-5 must actually move the system
    assert not np.array_equal(pos, np.asarray(args[0].pos))


def test_allocation_aware_auto_impl(monkeypatch):
    """impl='auto' on a TPU-ish platform consults the session probe:
    degraded Mosaic capacity -> 'xla', healthy -> 'pallas'; CPU hosts
    never probe (resolve to 'jnp')."""
    from nbody_streams_tpu.ops import dispatch, probe

    calls = []

    def fake_scale(value):
        def _scale():
            calls.append(1)
            return value
        return _scale

    # CPU host: never probes, picks jnp regardless of n
    monkeypatch.setattr(probe, "rate_scale", fake_scale(0.3))
    assert dispatch._default_impl(None, "spline", 65536) == "jnp"
    assert not calls

    # TPU-ish host, degraded probe -> xla; healthy -> pallas
    # (jax_default_device is None under the test conftest, so the
    # platform comes from default_backend)
    assert jax.config.jax_default_device is None
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(probe, "rate_scale", fake_scale(0.35))
    assert dispatch._default_impl(None, "spline", 65536) == "xla"
    monkeypatch.setattr(probe, "rate_scale", fake_scale(0.95))
    assert dispatch._default_impl(None, "spline", 65536) == "pallas"
    # the Mosaic throttle is N-dependent: above the crossover the Pallas
    # path wins even on a degraded allocation, so auto never switches
    # (and never probes) there
    calls.clear()
    monkeypatch.setattr(probe, "rate_scale", fake_scale(0.1))
    assert dispatch._default_impl(
        None, "spline", dispatch._XLA_AUTO_MAX_N) == "pallas"
    assert dispatch._default_impl(None, "spline", 1_048_576) == "pallas"
    # below the sorted-path threshold / non-spline: no probe, pallas
    assert dispatch._default_impl(None, "spline", 4096) == "pallas"
    assert dispatch._default_impl(None, "plummer", 65536) == "pallas"
    assert not calls
