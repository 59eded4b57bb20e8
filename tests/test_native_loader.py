"""Native C++ loader tests: build, parity with numpy sampler, prefetch."""

import os
import time

import numpy as np
import pytest

from hm_vae_tpu.data import layout, synthetic
from hm_vae_tpu.data.native_loader import NativeMotionLoader, get_library


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("native_ds"))
    synthetic.generate_dataset(d, num_seqs=5, min_len=40, max_len=100, seed=3)
    return d


def test_library_builds():
    assert get_library() is not None


def test_sample_batch_contract(data_dir):
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    nl = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                            os.path.join(data_dir, "train.json"), ms, 16)
    assert len(nl) == 4
    b = nl.sample_batch(6)
    assert b["rot_6d"].shape == (6, 16, 24, 6)
    assert b["rot_mat"].shape == (6, 16, 24, 3, 3)
    assert b["root_v"].shape == (6, 16, 3)
    # rotations are valid (windows really come from the files)
    mats = b["rot_mat"].reshape(-1, 3, 3)
    eye = np.einsum("nab,ncb->nac", mats, mats)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    # normalisation fused correctly: invert it and compare against raw
    ms2 = ms.copy()
    ms2[1, ms2[1] == 0] = 1.0
    pos_mean = ms2[0, layout.COORD].reshape(24, 3)
    pos_std = ms2[1, layout.COORD].reshape(24, 3)
    np.testing.assert_allclose(
        b["joint_pos"] * pos_std + pos_mean, b["rot_pos"], atol=1e-4)


def test_windows_are_contiguous_slices(data_dir):
    """Each sampled window must be a contiguous slice of some source file."""
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    nl = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                            os.path.join(data_dir, "train.json"), ms, 12)
    import json
    with open(os.path.join(data_dir, "train.json")) as f:
        names = list(json.load(f).values())
    seqs = [np.load(os.path.join(data_dir, "seqs", n)) for n in names]
    b = nl.sample_batch(4)
    raw0 = np.concatenate([
        b["rot_6d"].reshape(4, 12, -1),
        b["rot_mat"].reshape(4, 12, -1),
        b["rot_pos"].reshape(4, 12, -1),
    ], axis=-1)
    for i in range(4):
        window = raw0[i]
        found = False
        for s in seqs:
            s_cat = s[:, :432]
            for t0 in range(s.shape[0] - 12 + 1):
                if np.allclose(s_cat[t0:t0 + 12], window, atol=1e-5):
                    found = True
                    break
            if found:
                break
        assert found, f"window {i} not found in any source sequence"


def test_mt_fill_deterministic_and_complete(data_dir):
    """The one-shot thread-team fill (ml_sample_fields_mt): correctness on
    multi-core hosts is thread-count independent of the machine — per-thread
    RNG streams are seeded deterministically (seed + const*(t+1)) over
    disjoint row ranges, so (a) two loaders with the same seed produce
    bit-identical MT batches, and (b) every row is a real contiguous window
    of a source file (no torn or unwritten rows)."""
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))

    def mk():
        return NativeMotionLoader(os.path.join(data_dir, "seqs"),
                                  os.path.join(data_dir, "train.json"), ms,
                                  12, seed=5)

    a = mk().sample_batch(16, threads=4)
    b = mk().sample_batch(16, threads=4)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    import json
    with open(os.path.join(data_dir, "train.json")) as f:
        names = list(json.load(f).values())
    seqs = [np.load(os.path.join(data_dir, "seqs", n)) for n in names]
    raw = np.concatenate([
        a["rot_6d"].reshape(16, 12, -1),
        a["rot_mat"].reshape(16, 12, -1),
        a["rot_pos"].reshape(16, 12, -1),
    ], axis=-1)
    for i in range(16):
        assert any(
            np.allclose(s[t0:t0 + 12, :432], raw[i], atol=1e-5)
            for s in seqs for t0 in range(s.shape[0] - 12 + 1)
        ), f"row {i} is not a window of any source sequence"
    # the thread split actually diversified rows (not one stream repeated)
    assert len({raw[i].tobytes() for i in range(16)}) > 4


def test_prefetch_threads(data_dir):
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    nl = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                            os.path.join(data_dir, "train.json"), ms, 16,
                            seed=9)
    nl.start_prefetch(8, depth=3, threads=2)
    seen = []
    for _ in range(5):
        b = nl.next_batch()
        assert b["rot_6d"].shape == (8, 16, 24, 6)
        seen.append(b["rot_6d"].sum())
    # batches differ (threads produce fresh samples)
    assert len({round(float(s), 4) for s in seen}) > 1
    nl.close()


def test_fps_aug_runs(data_dir):
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    nl = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                            os.path.join(data_dir, "train.json"), ms, 16,
                            fps_aug=True, seed=2)
    b = nl.sample_batch(16)
    assert np.isfinite(b["rot_6d"]).all()


def test_compact_rot6d_wire_matches_rotmat_wire(data_dir):
    """Same seed/counter -> same windows; the 6D wire must be exactly the
    first two columns of the rotmat wire, and Gram-Schmidt must reconstruct
    the rotmat wire's matrices (the 6D rep IS columns 0,1 of a true
    rotation, utils/process_all_data_motion.py:136-137)."""
    from hm_vae_tpu.ops import rotations as rot

    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    a = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                           os.path.join(data_dir, "train.json"), ms, 16,
                           seed=4)
    b = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                           os.path.join(data_dir, "train.json"), ms, 16,
                           seed=4)
    ca = a.sample_compact(6, need_root_v=True, threads=1, wire="rotmat")
    cb = b.sample_compact(6, need_root_v=True, threads=1, wire="rot6d")
    assert cb["rot_6d"].shape == (6, 16, 24, 6)
    # 6D == transposed first two rows of R^T? no: columns of R, in the
    # reference's stacking order (rot_mat_to_6d, seq_two_hier_sa_vae.py:773)
    expect_6d = np.asarray(
        rot.rotmat_to_rot6d(ca["rot_mat"]))
    np.testing.assert_allclose(cb["rot_6d"], expect_6d, atol=1e-6)
    np.testing.assert_allclose(cb["root_v"], ca["root_v"], atol=1e-6)
    recon = np.asarray(rot.rot6d_to_rotmat(cb["rot_6d"]))
    np.testing.assert_allclose(recon, ca["rot_mat"], atol=1e-5)


def test_compact_aa_wire_reconstructs_rotmat(data_dir):
    """Same seed -> same windows; Rodrigues of the C++ axis-angle sidecar
    must reproduce the rotmat wire's matrices (SO(3) log/exp round trip)."""
    from hm_vae_tpu.ops import rotations as rot

    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    a = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                           os.path.join(data_dir, "train.json"), ms, 16,
                           seed=4)
    b = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                           os.path.join(data_dir, "train.json"), ms, 16,
                           seed=4)
    ca = a.sample_compact(6, need_root_v=True, threads=1, wire="rotmat")
    cb = b.sample_compact(6, need_root_v=True, threads=1, wire="aa")
    assert cb["aa"].shape == (6, 16, 24, 3)
    recon = np.asarray(rot.aa_to_rotmat(cb["aa"]))
    np.testing.assert_allclose(recon, ca["rot_mat"], atol=2e-5)
    np.testing.assert_allclose(cb["root_v"], ca["root_v"], atol=1e-6)


def test_aa_sidecar_near_pi_robust(tmp_path):
    """The C++ log map's theta ~ pi branch (axis from the symmetric part)
    must still round-trip: craft a pool of rotations at theta in
    {pi, pi - 1e-5, pi - 1e-3} about random axes."""
    import json

    from hm_vae_tpu.ops import rotations as rot

    rng = np.random.default_rng(0)
    T = 16
    frames = np.zeros((T, layout.FRAME_DIM), np.float32)
    thetas = np.concatenate([
        np.full(8, np.pi), [np.pi - 1e-5, np.pi - 1e-3, np.pi - 1e-2,
                            1e-7, 1e-4, 0.5, 1.5, 2.5]])
    mats = np.zeros((T, 24, 3, 3), np.float64)
    for t in range(T):
        for j in range(24):
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            th = thetas[t]
            K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                          [-ax[1], ax[0], 0]])
            mats[t, j] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    frames[:, layout.ROTMAT] = mats.reshape(T, -1).astype(np.float32)
    d = tmp_path / "pool"
    (d / "seqs").mkdir(parents=True)
    np.save(d / "seqs" / "s0.npy", frames)
    with open(d / "train.json", "w") as f:
        json.dump({"0": "s0.npy"}, f)
    ms = np.stack([np.zeros(layout.FRAME_DIM), np.ones(layout.FRAME_DIM)]
                  ).astype(np.float32)
    nl = NativeMotionLoader(str(d / "seqs"), str(d / "train.json"), ms, T,
                            seed=1)
    cb = nl.sample_compact(2, threads=1, wire="aa")
    recon = np.asarray(rot.aa_to_rotmat(cb["aa"].astype(np.float64)))
    # seq_len == T: only one window possible, so compare the pool directly
    np.testing.assert_allclose(
        recon, np.broadcast_to(mats, (2, T, 24, 3, 3)), atol=5e-5)


@pytest.mark.slow
def test_trainer_rot6d_wire_loss_matches(data_dir, tmp_path):
    """A jitted train step fed the rot6d wire must produce the same loss and
    gradients as the rotmat wire (device-side reconstruction is exact)."""
    import jax
    import jax.numpy as jnp

    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.train.losses import hmvae_forward
    from hm_vae_tpu.utils.config import Config, ModelConfig

    cfg = Config(model=ModelConfig(latent_d=6, shallow_latent_d=6,
                                   kernel_size=3, train_seq_len=16))
    model = HMVAE(cfg.model)
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    nl = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                            os.path.join(data_dir, "train.json"), ms, 16,
                            seed=11)
    full = nl.sample_compact(4, threads=1, wire="rotmat")
    nl2 = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                             os.path.join(data_dir, "train.json"), ms, 16,
                             seed=11)
    wire6 = nl2.sample_compact(4, threads=1, wire="rot6d")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 24, 6)))
    rng = jax.random.PRNGKey(5)
    step = jnp.zeros((), jnp.int32)

    l_a, _ = hmvae_forward(model, params,
                           {"rot_mat": jnp.asarray(full["rot_mat"])},
                           rng, step, cfg)
    l_b, _ = hmvae_forward(model, params,
                           {"rot_6d": jnp.asarray(wire6["rot_6d"])},
                           rng, step, cfg)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-4)

    nl3 = NativeMotionLoader(os.path.join(data_dir, "seqs"),
                             os.path.join(data_dir, "train.json"), ms, 16,
                             seed=11)
    wire_aa = nl3.sample_compact(4, threads=1, wire="aa")
    l_c, _ = hmvae_forward(model, params, {"aa": jnp.asarray(wire_aa["aa"])},
                           rng, step, cfg)
    np.testing.assert_allclose(float(l_a), float(l_c), rtol=1e-4)


def test_build_failure_warns_with_compiler_error(tmp_path, monkeypatch, caplog):
    """A failing g++ must SURFACE (one warning carrying the compiler error),
    not silently return None (round-2 verdict item 6)."""
    import logging
    import subprocess

    from hm_vae_tpu.data import native_loader as nl_mod

    def fail(cmd, check, capture_output):
        raise subprocess.CalledProcessError(
            1, cmd, stderr=b"loader.cpp:1:1: error: boom")

    monkeypatch.setattr(nl_mod.subprocess, "run", fail)
    # point the cache at an empty dir so the existing .so doesn't satisfy it
    monkeypatch.setenv("HM_VAE_TPU_NATIVE_BUILD_DIR", str(tmp_path / "build"))
    with caplog.at_level(logging.WARNING,
                         logger="hm_vae_tpu.data.native_loader"):
        assert nl_mod._build_library() is None
    assert any("error: boom" in r.getMessage() for r in caplog.records)


def test_make_loaders_falls_back_with_warning(tmp_path, monkeypatch, caplog):
    """make_loaders drops to the numpy sampler WITH a warning carrying the
    underlying error when the native loader cannot be constructed (the old
    `except Exception: pass` hid toolchain regressions)."""
    import logging

    from hm_vae_tpu.data import dataset as ds_mod
    from hm_vae_tpu.data import native_loader as nl_mod
    from hm_vae_tpu.utils.config import Config, DataConfig, ModelConfig

    monkeypatch.setattr(nl_mod, "get_library", lambda: None)
    cfg = Config(
        model=ModelConfig(train_seq_len=8),
        data=DataConfig(synthetic=True, synthetic_num_seqs=4,
                        data_root=str(tmp_path / "d")),
    )
    with caplog.at_level(logging.WARNING, logger="hm_vae_tpu.data.dataset"):
        train, _, _ = ds_mod.make_loaders(cfg)
    assert isinstance(train, ds_mod.MotionDataset)
    assert any("native C++ loader unavailable" in r.getMessage()
               for r in caplog.records)
