"""Multi-host process plumbing (parallel/multihost.py).

Covers three layers: the pure shard-selection logic for all (index, count)
combinations, the single-process identity behaviour the rest of the suite
rides on, and a REAL two-OS-process jax.distributed cluster (CPU Gloo
collectives) running full cli.train + resume.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hm_vae_tpu.parallel import multihost as mh


def test_process_shard_balanced_cover():
    """Shards are contiguous, disjoint, cover everything, and differ in
    size by at most 1 — for every (n_items, count) combination."""
    for count in (1, 2, 3, 5, 8):
        for n in (0, 1, 7, 8, 10818):   # incl. the reference train split
            spans = [mh.process_shard(n, i, count) for i in range(count)]
            sizes = [b - a for a, b in spans]
            assert all(s >= 0 for s in sizes)
            assert sum(sizes) == n
            assert max(sizes) - min(sizes) <= 1
            assert spans[0][0] == 0 and spans[-1][1] == n
            for (a0, b0), (a1, b1) in zip(spans, spans[1:]):
                assert b0 == a1   # contiguous, ordered


def test_process_shard_rejects_bad_index():
    with pytest.raises(ValueError):
        mh.process_shard(10, 3, 3)
    with pytest.raises(ValueError):
        mh.process_shard(10, -1, 3)


def test_local_batch_size():
    assert mh.local_batch_size(32, count=4) == 8
    assert mh.local_batch_size(8, count=1) == 8
    with pytest.raises(ValueError, match="divide"):
        mh.local_batch_size(10, count=4)


def test_process_seed_distinct_streams():
    seeds = [mh.process_seed(7, index=i, count=16) for i in range(16)]
    assert len(set(seeds)) == 16
    assert seeds[0] == 7                      # identity for process 0
    # identity single-process (no explicit index)
    assert mh.process_seed(7) == 7
    # count validates index, same contract as process_shard
    with pytest.raises(ValueError):
        mh.process_seed(7, index=3, count=3)


def test_host_local_copy_single_process_identity():
    """Single-process the params pass through untouched (no copies, no
    dtype churn); multi-process semantics are covered by the 2-process viz
    e2e below."""
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": np.ones(3)}
    out = mh.host_local_copy(tree)
    assert out["w"] is tree["w"] and out["b"] is tree["b"]


def test_single_process_identity():
    assert mh.process_index() == 0
    assert mh.process_count() == 1
    assert mh.is_primary()
    a, b = mh.process_shard(17)
    assert (a, b) == (0, 17)


def test_gated_off_without_env(monkeypatch):
    monkeypatch.delenv("HMVAE_DIST", raising=False)
    assert mh.maybe_initialize_distributed() is False
    monkeypatch.setenv("HMVAE_DIST", "0")
    assert mh.maybe_initialize_distributed() is False


def test_make_global_batch_single_process():
    """Single-process, make_global_batch == sharded device_put: the train
    ingest path is byte-identical with or without the multihost hop."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hm_vae_tpu.parallel import sharding as sh

    mesh = sh.make_mesh(8, model_parallel=1)
    bsh = NamedSharding(mesh, P("data"))
    tree = {"x": np.arange(64, dtype=np.float32).reshape(8, 8),
            "y": np.ones((8, 3), np.float32)}
    out = mh.make_global_batch(tree, bsh)
    for k in tree:
        assert out[k].sharding == bsh
        np.testing.assert_array_equal(np.asarray(out[k]), tree[k])


def test_trainer_fit_through_to_global(tmp_path):
    """The fit loop routes every batch through _to_global (identity
    single-process): end-to-end training still descends and logs."""
    from hm_vae_tpu.train.trainer import build_trainer
    from hm_vae_tpu.utils.config import (
        Config, DataConfig, ModelConfig, OptimConfig, RunConfig,
    )

    cfg = Config(
        model=ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3,
                          train_seq_len=8),
        optim=OptimConfig(lr=1e-3, batch_size=4, max_iter=4),
        data=DataConfig(synthetic=True, synthetic_num_seqs=6,
                        data_root=str(tmp_path / "data")),
        run=RunConfig(log_iter=2, validation_iter=3,
                      snapshot_save_iter=10**9, image_save_iter=10**9,
                      nan_guard=False),
    )
    trainer, train_ds, val_ds, _ = build_trainer(cfg, str(tmp_path / "run"))
    m = trainer.fit(train_ds, val_ds)
    assert np.isfinite(m["loss_total"])
    assert int(trainer.state.step) == 4
    # single-process: the primary gate keeps the writer real
    assert os.path.exists(os.path.join(str(tmp_path / "run"), "logs",
                                       "metrics.jsonl"))


@pytest.mark.slow
def test_two_process_distributed_training_e2e(tmp_path):
    """REAL multi-host path: two OS processes, each with 2 virtual CPU
    devices, wired by jax.distributed (Gloo collectives) through the
    HMVAE_DIST env gate — full cli.train run + distributed resume on a
    shared output dir.  Asserts: identical replicated metrics on both
    processes (the loss is a global-batch mean), checkpoints written by
    process 0 only (orbax active_processes={0}), resume restores on both.
    """
    import socket
    import subprocess
    import sys

    import yaml

    from hm_vae_tpu.data import synthetic

    # pre-generate the dataset: both processes read it, neither races to
    # create it
    data_dir = str(tmp_path / "data")
    synthetic.generate_dataset(data_dir, num_seqs=6, seed=0)

    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 8, "lr": 0.001,
        "max_iter": 4, "log_iter": 2, "validation_iter": 3,
        "snapshot_save_iter": 3, "image_save_iter": 10**9,
        "nan_guard": False, "data_root": data_dir,
    }
    cfg_path = str(tmp_path / "mh.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    with socket.socket() as s:   # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out = str(tmp_path / "shared")

    def launch(pid, extra=()):
        env = dict(os.environ,
                   HMVAE_DIST="1",
                   JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   HMVAE_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        env.pop("JAX_PLATFORMS", None)
        return subprocess.Popen(
            [sys.executable, "-m", "hm_vae_tpu.cli.train",
             "--config", cfg_path, "--output_path", out, *extra],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    procs = [launch(0), launch(1)]
    logs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"process {pid} failed:\n{log[-3000:]}"
    # replicated metrics: both processes print the identical global loss
    fin = [next(l for l in log.splitlines() if l.startswith("Finish"))
           for log in logs]
    assert fin[0] == fin[1]
    # process-0-only writes on the shared dir
    ckpts = sorted(os.listdir(os.path.join(out, "outputs", "mh",
                                           "checkpoints")))
    assert ckpts == ["gen_00000003", "gen_00000004"], ckpts
    import json as _json
    with open(os.path.join(out, "outputs", "mh", "logs",
                           "metrics.jsonl")) as f:
        recs = [_json.loads(l) for l in f]
    assert any("val_loss_total" in r for r in recs)   # sharded val ran
    steps = [r["step"] for r in recs]
    assert steps == sorted(steps)   # ONE writer: no interleaved duplicates

    # distributed resume on the shared checkpoint
    procs = [launch(0, ("--resume", "--max_iter", "6")),
             launch(1, ("--resume", "--max_iter", "6"))]
    logs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"resume process {pid} failed:\n{log[-3000:]}"
        assert "Resume from iteration 4" in log


@pytest.mark.slow
def test_two_process_synthetic_generation_and_viz(tmp_path):
    """Two multi-host sharp edges in one real 2-process run:

    1. synthetic dataset auto-generation on a SHARED data root — process 0
       generates, process 1 blocks on the pod barrier (concurrent
       generators used to race on the same files);
    2. the periodic visualization save (image_save_iter) — process 0 runs
       it alone on a HOST-LOCAL param copy; were the inference jits still
       closed over pod-spanning params, the lone-process SPMD launch would
       desynchronise the collective order and hang both processes (the
       subprocess timeout is the detector).
    """
    import socket
    import subprocess
    import sys

    import yaml

    data_dir = str(tmp_path / "data")   # does NOT exist: generated in-run
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 8, "lr": 0.001,
        "max_iter": 2, "log_iter": 2, "validation_iter": 10**9,
        "snapshot_save_iter": 10**9, "image_save_iter": 2,
        "nan_guard": False, "synthetic": True, "synthetic_num_seqs": 6,
        "data_root": data_dir,
    }
    cfg_path = str(tmp_path / "gen.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = str(tmp_path / "shared")

    def launch(pid):
        env = dict(os.environ,
                   HMVAE_DIST="1",
                   JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   HMVAE_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        env.pop("JAX_PLATFORMS", None)
        return subprocess.Popen(
            [sys.executable, "-m", "hm_vae_tpu.cli.train",
             "--config", cfg_path, "--output_path", out],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    procs = [launch(0), launch(1)]
    logs = [p.communicate(timeout=360)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"process {pid} failed:\n{log[-3000:]}"
    # one complete generated dataset on the shared root
    import json as _json
    with open(os.path.join(data_dir, "train.json")) as f:
        names = _json.load(f)
    assert names and all(
        os.path.exists(os.path.join(data_dir, "seqs", n))
        for n in names.values())
    # the viz crossing produced artifacts (mp4 or the gif fallback)
    img_dir = os.path.join(out, "outputs", "gen", "images", "2")
    assert os.path.isdir(img_dir) and os.listdir(img_dir)


@pytest.mark.slow
def test_two_process_reconstruction_matches_single(tmp_path):
    """eval_recovery --test_model_rec --data_parallel over a real 2-process
    cluster: window batches assemble via make_array_from_process_local_data
    (a plain device_put onto the pod-spanning sharding is not addressable),
    outputs replicate back, and the summary written by process 0 is
    identical to a single-process run."""
    import json
    import socket
    import subprocess
    import sys

    import yaml

    from hm_vae_tpu.data import synthetic

    data_dir = str(tmp_path / "data")
    synthetic.generate_dataset(data_dir, num_seqs=6, seed=0)
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "data_root": data_dir,
    }
    cfg_path = str(tmp_path / "rec.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", cfg_path, "--output_path", str(tmp_path / "single"),
          "--test_model_rec", "--max_seqs", "2"])
    with open(tmp_path / "single" / "eval_reconstruction" / "rec" /
              "summary.json") as f:
        ref = json.load(f)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    def launch(pid):
        env = dict(os.environ,
                   HMVAE_DIST="1",
                   JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   HMVAE_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        env.pop("JAX_PLATFORMS", None)
        return subprocess.Popen(
            [sys.executable, "-m", "hm_vae_tpu.cli.eval_recovery",
             "--config", cfg_path, "--output_path", str(tmp_path / "pod"),
             "--test_model_rec", "--max_seqs", "2", "--data_parallel", "4"],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    procs = [launch(0), launch(1)]
    logs = [p.communicate(timeout=360)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"process {pid} failed:\n{log[-3000:]}"
    with open(tmp_path / "pod" / "eval_reconstruction" / "rec" /
              "summary.json") as f:
        pod = json.load(f)
    assert set(pod) == set(ref)
    for k in ref:
        np.testing.assert_allclose(pod[k], ref[k], rtol=1e-5, err_msg=k)


@pytest.mark.slow
def test_two_process_distributed_eval_matches_single(tmp_path):
    """Pod-scale flagship workload: eval_recovery --data_parallel over a
    real two-process jax.distributed cluster — each process contributes its
    window rows (make_array_from_process_local_data), the solve runs
    GSPMD-sharded across both processes, outputs replicate back, and the
    summary (written once, by process 0) is IDENTICAL to a single-process
    run of the same config."""
    import json
    import socket
    import subprocess
    import sys

    import yaml

    from hm_vae_tpu.data import synthetic

    data_dir = str(tmp_path / "data")
    synthetic.generate_dataset(data_dir, num_seqs=6, seed=0)
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "data_root": data_dir,
        "opt_it": 4, "opt_lr": 0.1, "opt_step_size": 2, "prev_epochs": 2,
        "interpolation_window": 3, "optimize_decoder": True,
        "replace_frame_with_gt": True,
    }
    cfg_path = str(tmp_path / "interp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # single-process reference (in-process: the conftest CPU backend)
    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", cfg_path, "--output_path", str(tmp_path / "single"),
          "--final_try_long_seq_interpolation", "--max_seqs", "2",
          "--batch_across_seqs"])
    with open(tmp_path / "single" / "eval_long_seq_interpolation" /
              "interp" / "summary.json") as f:
        ref = json.load(f)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    def launch(pid):
        env = dict(os.environ,
                   HMVAE_DIST="1",
                   JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   HMVAE_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        env.pop("JAX_PLATFORMS", None)
        return subprocess.Popen(
            [sys.executable, "-m", "hm_vae_tpu.cli.eval_recovery",
             "--config", cfg_path, "--output_path", str(tmp_path / "pod"),
             "--final_try_long_seq_interpolation", "--max_seqs", "2",
             "--batch_across_seqs", "--data_parallel", "4"],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    procs = [launch(0), launch(1)]
    logs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"process {pid} failed:\n{log[-3000:]}"
    with open(tmp_path / "pod" / "eval_long_seq_interpolation" / "interp" /
              "summary.json") as f:
        pod = json.load(f)
    # low opt_it keeps chaotic codegen-noise amplification below measurement
    # precision (see test_latent_opt.py) — the pod summary matches tightly
    assert set(pod) == set(ref)
    for k in ref:
        np.testing.assert_allclose(pod[k], ref[k], rtol=1e-4, err_msg=k)
