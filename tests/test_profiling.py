"""utils/profiling.py: the timing helpers behave as documented."""

import glob
import os

import jax.numpy as jnp

from hm_vae_tpu.utils.profiling import Timer, time_fn, trace


def test_timer_measures_elapsed(capsys):
    with Timer("unit", verbose=True) as t:
        sum(range(1000))
    assert t.elapsed > 0
    assert "[timer] unit:" in capsys.readouterr().out
    with Timer(verbose=False) as t2:
        pass
    assert capsys.readouterr().out == ""
    assert t2.elapsed >= 0


def test_time_fn_median_positive():
    f = lambda x: (x * 2).sum()
    sec = time_fn(f, jnp.arange(128.0), iters=3, warmup=1)
    assert sec > 0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        jnp.arange(16.0).sum().block_until_ready()
    # jax.profiler writes plugins/profile/<ts>/*.pb under the log dir
    found = glob.glob(os.path.join(d, "**", "*.pb"), recursive=True) + \
        glob.glob(os.path.join(d, "**", "*.xplane*"), recursive=True)
    assert found, f"no trace artifacts under {d}"
