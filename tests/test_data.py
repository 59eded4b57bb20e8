"""Data pipeline tests: layout offsets, synthetic gen, sampling, augs."""

import os

import numpy as np
import pytest

from hm_vae_tpu.data import layout, synthetic
from hm_vae_tpu.data.dataset import (
    EvalMotionDataset, MotionDataset, random_rotation_matrices,
)


def test_layout_offsets():
    assert layout.ROT6D == slice(0, 144)
    assert layout.ROTMAT == slice(144, 360)
    assert layout.COORD == slice(360, 432)
    assert layout.LINEAR_V == slice(432, 504)
    assert layout.ANGULAR_V == slice(504, 576)
    assert layout.ROOT_V == slice(576, 579)
    assert layout.FRAME_DIM == 579


def test_synth_sequence_consistency():
    rng = np.random.default_rng(0)
    seq = synthetic.synth_sequence(rng, 32)
    assert seq.shape == (32, 579)
    mats = seq[:, layout.ROTMAT].reshape(32, 24, 3, 3)
    # valid rotations
    eye = np.einsum("tjab,tjcb->tjac", mats, mats)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    # rot6d matches first two columns
    six = seq[:, layout.ROT6D].reshape(32, 24, 6)
    np.testing.assert_allclose(six[..., :3], mats[..., :, 0], atol=1e-6)
    # linear_v is the coord diff with zero first frame
    coords = seq[:, layout.COORD]
    lv = seq[:, layout.LINEAR_V]
    np.testing.assert_allclose(lv[1:], np.diff(coords, axis=0), atol=1e-5)
    np.testing.assert_allclose(lv[0], 0, atol=1e-6)
    # angular slot duplicates linear (reference quirk kept for layout parity)
    np.testing.assert_allclose(seq[:, layout.ANGULAR_V], lv)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synds"))
    synthetic.generate_dataset(d, num_seqs=6, min_len=40, max_len=90, seed=1)
    return d


def test_dataset_batches(data_dir):
    import os
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    ds = MotionDataset(os.path.join(data_dir, "seqs"),
                       os.path.join(data_dir, "train.json"), ms, 16, seed=0)
    b = ds.sample_batch(4)
    assert b["rot_6d"].shape == (4, 16, 24, 6)
    assert b["rot_mat"].shape == (4, 16, 24, 3, 3)
    assert b["root_v"].shape == (4, 16, 3)
    # normalized fields have moderate scale
    assert abs(b["joint_pos"].mean()) < 1.0
    # consistency between 6d and rotmat fields
    np.testing.assert_allclose(
        b["rot_6d"][..., :3], b["rot_mat"][..., :, 0], atol=1e-6)


def test_fps_aug_and_reproducibility(data_dir):
    import os
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    mk = lambda s: MotionDataset(os.path.join(data_dir, "seqs"),
                                 os.path.join(data_dir, "train.json"), ms, 16,
                                 fps_aug=True, seed=s)
    b1 = mk(7).sample_batch(8)
    b2 = mk(7).sample_batch(8)
    np.testing.assert_allclose(b1["rot_6d"], b2["rot_6d"])  # same seed = same data
    b3 = mk(8).sample_batch(8)
    assert np.abs(b1["rot_6d"] - b3["rot_6d"]).max() > 1e-3


def test_random_rotation_matrices_uniformity():
    R = random_rotation_matrices(np.random.default_rng(0), 2000)
    eye = np.einsum("nab,ncb->nac", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # mean rotated z-axis should be ~0 for a uniform distribution
    v = R @ np.array([0.0, 0.0, 1.0])
    assert np.abs(v.mean(axis=0)).max() < 0.06


def test_root_rot_aug_consistency(data_dir):
    import os
    ms = np.load(os.path.join(data_dir, "mean_std.npy"))
    ds = MotionDataset(os.path.join(data_dir, "seqs"),
                       os.path.join(data_dir, "train.json"), ms, 16,
                       random_root_rot=True, seed=0)
    b = ds.sample_batch(4)
    mats = b["rot_mat"]
    # still valid rotations after augmentation
    eye = np.einsum("xtjab,xtjcb->xtjac", mats, mats)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    # 6d rebuilt from matrices
    np.testing.assert_allclose(b["rot_6d"][..., 3:], mats[..., :, 1], atol=1e-6)


def test_eval_dataset_masks(data_dir):
    import os
    ds = EvalMotionDataset(os.path.join(data_dir, "seqs"),
                           os.path.join(data_dir, "test.json"), missing="lower")
    item = ds[0]
    m = item["mask"]
    assert m.shape[1] == 24
    assert (m[:, list(EvalMotionDataset.LOWER_JOINTS)] == 0).all()
    assert (m[:, 0] == 1).all()
    # masked reps zeroed exactly where mask == 0
    assert (item["masked_6d"][m == 0] == 0).all()
    assert (item["masked_rot"][m == 0] == 0).all()


def test_eval_dataset_precomputed_mask_dir(data_dir, tmp_path):
    import json, os
    with open(os.path.join(data_dir, "test.json")) as f:
        names = list(json.load(f).values())
    mask_dir = str(tmp_path / "masks")
    os.makedirs(mask_dir)
    rng = np.random.default_rng(0)
    for n in names:
        T = np.load(os.path.join(data_dir, "seqs", n)).shape[0]
        np.save(os.path.join(mask_dir, n),
                (rng.random((T, 24)) > 0.3).astype(np.float32))
    ds = EvalMotionDataset(os.path.join(data_dir, "seqs"),
                           os.path.join(data_dir, "test.json"),
                           missing="random", mask_dir=mask_dir)
    item = ds[0]
    saved = np.load(os.path.join(mask_dir, item["name"]))
    np.testing.assert_allclose(item["mask"], saved[:item["mask"].shape[0]])


def test_mask_generation_cli(tmp_path):
    """prep_data --gen_masks: precomputed per-frame masks for the
    missing_joint_prob eval workflow (utils_motion_vae.py:247, 276-277)."""
    import json

    from hm_vae_tpu.cli.prep_data import main as prep_main
    from hm_vae_tpu.data.synthetic import generate_dataset
    from hm_vae_tpu.data.dataset import EvalMotionDataset

    d = str(tmp_path / "data")
    generate_dataset(d, num_seqs=5, seed=0)
    prep_main(["--dest", d, "--gen_masks", "0.5", "--mask_split", "test"])
    mask_dir = os.path.join(d, "eval_masks", "missing_prob_0.5")
    with open(os.path.join(d, "test.json")) as f:
        names = list(json.load(f).values())
    assert sorted(os.listdir(mask_dir)) == sorted(names)
    m = np.load(os.path.join(mask_dir, names[0]))
    seq = np.load(os.path.join(d, "seqs", names[0]))
    assert m.shape == (seq.shape[0], 24)
    assert set(np.unique(m)) <= {0.0, 1.0}
    assert 0.3 < m.mean() < 0.7  # ~half visible at prob 0.5

    # deterministic regeneration
    prep_main(["--dest", d, "--gen_masks", "0.5", "--mask_split", "test"])
    np.testing.assert_array_equal(m, np.load(os.path.join(mask_dir, names[0])))

    # EvalMotionDataset consumes the generated masks via mask_dir
    ds = EvalMotionDataset(os.path.join(d, "seqs"),
                           os.path.join(d, "test.json"), mask_dir=mask_dir)
    item = ds[0]
    np.testing.assert_array_equal(
        item["mask"], np.load(os.path.join(mask_dir, item["name"])))


def test_ordered_validation_batches_deterministic(tmp_path):
    """ordered_batches: identical windows on every pass and across dataset
    instances with different sampler seeds — run-comparable val curves
    (reference's ordered val loader, train_motion_vae.py:98-110)."""
    d = str(tmp_path / "data")
    synthetic.generate_dataset(d, num_seqs=6, seed=0)
    ms = np.load(os.path.join(d, "mean_std.npy")).astype(np.float32)

    def mk(seed):
        return MotionDataset(os.path.join(d, "seqs"),
                             os.path.join(d, "val.json"), ms,
                             train_seq_len=8, fps_aug=True,
                             random_root_rot=True, seed=seed)

    a = list(mk(1).ordered_batches(2, max_batches=3, seed=7))
    b = list(mk(999).ordered_batches(2, max_batches=3, seed=7))
    assert len(a) == len(b) >= 1
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])

    # consuming random batches in between must not perturb the ordered pass
    ds = mk(1)
    first = list(ds.ordered_batches(2, max_batches=2, seed=7))
    ds.sample_batch(4)
    second = list(ds.ordered_batches(2, max_batches=2, seed=7))
    for ba, bb in zip(first, second):
        np.testing.assert_array_equal(ba["rot_6d"], bb["rot_6d"])

    # augmentation fully off in eval mode: every ordered window must be a
    # CONTIGUOUS (stride-1, unrotated) slice of some source sequence
    import json
    with open(os.path.join(d, "val.json")) as f:
        names = list(json.load(f).values())
    srcs = [np.load(os.path.join(d, "seqs", n)) for n in names]
    for batch in first:
        flat = np.concatenate([
            batch["rot_6d"].reshape(2, 8, -1),
            batch["rot_mat"].reshape(2, 8, -1),
        ], axis=-1)
        for i in range(flat.shape[0]):
            found = any(
                np.allclose(s[t0:t0 + 8, :360], flat[i], atol=1e-5)
                for s in srcs if s.shape[0] >= 8
                for t0 in range(s.shape[0] - 8 + 1)
            )
            assert found, "ordered-batch window is augmented or non-contiguous"


# ---------------------------------------------------------------------------
# vendored reference split manifests (divide_train_val_json.py:118-120)

def test_reference_split_manifests_vendored():
    """The literal historical train/val/test inventories ship as assets."""
    import json

    from hm_vae_tpu.data.dataset import resolve_split_json
    from hm_vae_tpu.utils.config import Config

    expected = {"train": 10818, "val": 363, "test": 140}
    for split, n in expected.items():
        path = layout.reference_split_path(split)
        assert os.path.exists(path), path
        with open(path) as f:
            ids = json.load(f)
        assert len(ids) == n
        # index->name mapping must be dense "0".."N-1" (the format both
        # MotionDataset and the reference's MotionSeqData consume)
        assert sorted(ids, key=int) == [str(i) for i in range(n)]
        assert all(name.endswith(".npy") for name in ids.values())

    with pytest.raises(ValueError):
        layout.reference_split_path("dev")

    # config keyword "reference" resolves to the vendored manifest
    cfg = Config()
    cfg = dataclasses_replace_data(cfg, train_json="reference")
    assert resolve_split_json(cfg, "train") == layout.reference_split_path("train")


def dataclasses_replace_data(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, **kw))


def test_resolve_split_json_precedence(tmp_path):
    """Explicit path > data-dir-relative name > prep-generated fallback."""
    from hm_vae_tpu.data.dataset import resolve_split_json
    from hm_vae_tpu.utils.config import Config

    d = tmp_path / "data"
    d.mkdir()
    cfg = dataclasses_replace_data(Config(), data_root=str(d))

    # default field names don't exist yet -> fallback to prep-generated name
    assert resolve_split_json(cfg, "test") == str(d / "test.json")

    # reference-named manifest present in the data dir -> picked up
    rel = d / "test_all_amass_motion_data.json"
    rel.write_text("{}")
    assert resolve_split_json(cfg, "test") == str(rel)

    # explicit absolute path wins over everything
    abs_json = tmp_path / "custom_split.json"
    abs_json.write_text("{}")
    cfg2 = dataclasses_replace_data(cfg, test_json=str(abs_json))
    assert resolve_split_json(cfg2, "test") == str(abs_json)

    # an EXPLICITLY configured manifest that doesn't exist raises (silent
    # fallback would evaluate a different file inventory than requested);
    # only the dataclass-default field value gets the prep-generated fallback
    cfg3 = dataclasses_replace_data(cfg, test_json=str(tmp_path / "nope.json"))
    with pytest.raises(FileNotFoundError, match="test_json"):
        resolve_split_json(cfg3, "test")
