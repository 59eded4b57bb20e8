"""Visualization + AMASS prep tests."""

import json
import os

import numpy as np

from hm_vae_tpu.data import layout
from hm_vae_tpu.data.amass_prep import convert_sequence, process_amass_root
from hm_vae_tpu.utils.viz import save_animation, save_frame, save_skeleton_obj


def test_convert_sequence_layout():
    rng = np.random.default_rng(0)
    N = 120
    poses = rng.normal(size=(N, 156)).astype(np.float64) * 0.3
    trans = np.cumsum(rng.normal(size=(N, 3)) * 0.01, axis=0)
    out = convert_sequence(poses, trans, mocap_framerate=60, target_fps=30)
    assert out.shape == (60, 579)  # stride 2 resampling
    # root_v integrates back to (resampled) translation deltas
    rv = out[:, layout.ROOT_V]
    np.testing.assert_allclose(rv[1:], np.diff(trans[::2], axis=0), atol=1e-5)
    np.testing.assert_allclose(rv[0], 0, atol=1e-7)
    # too-short sequences dropped
    assert convert_sequence(poses[:40], trans[:40], 60, 30) is None


def test_process_amass_root(tmp_path):
    # build a fake AMASS directory with two subsets
    rng = np.random.default_rng(1)
    for subset, subject in (("CMU", "s1"), ("HumanEva", "s2")):
        d = os.path.join(tmp_path, "amass", subset, subject)
        os.makedirs(d)
        np.savez(os.path.join(d, "walk_poses.npz"),
                 poses=rng.normal(size=(90, 156)) * 0.3,
                 trans=rng.normal(size=(90, 3)),
                 mocap_framerate=30.0,
                 betas=rng.normal(size=16))
    dest = os.path.join(tmp_path, "processed")
    splits = process_amass_root(os.path.join(tmp_path, "amass"), dest,
                                verbose=False)
    assert len(splits["train"]) == 1  # CMU
    assert len(splits["val"]) == 1    # HumanEva
    assert os.path.exists(os.path.join(dest, "mean_std.npy"))
    ms = np.load(os.path.join(dest, "mean_std.npy"))
    assert ms.shape == (2, 579)
    with open(os.path.join(dest, "train.json")) as f:
        names = json.load(f)
    seq = np.load(os.path.join(dest, "seqs", names["0"]))
    assert seq.shape[1] == 579


def test_save_frame_and_obj(tmp_path):
    pose = np.random.default_rng(0).normal(size=(24, 3)).astype(np.float32)
    p = save_frame(pose, os.path.join(tmp_path, "f.png"))
    assert os.path.getsize(p) > 0
    o = save_skeleton_obj(pose, os.path.join(tmp_path, "s.obj"))
    text = open(o).read()
    assert text.count("\nf ") + text.startswith("f ") > 0
    assert "v " in text


def test_save_animation_small(tmp_path):
    seq = np.random.default_rng(0).normal(size=(1, 3, 24, 3)).astype(np.float32)
    p = save_animation(seq, os.path.join(tmp_path, "a.mp4"), fps=3)
    assert os.path.getsize(p) > 0
