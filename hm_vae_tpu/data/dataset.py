"""Host-side data pipeline: window sampling, normalisation, augmentation.

Functional re-design of ``MotionSeqData`` / ``EvalMotionSeqData``
(``utils_motion_vae.py:83-346``):

- sequences are memory-resident numpy arrays (the whole AMASS 579-dim set is
  ~4 GB; subsets and synthetic data far less), so "loading" is slicing;
- the per-item Python augmentations become *vectorised per-batch* numpy ops
  (one RNG call per batch instead of per item);
- batches are dicts keyed by :data:`hm_vae_tpu.data.layout.BATCH_FIELDS`, the
  7-tuple contract of the reference;
- an optional background thread overlaps host batch assembly with device
  compute (double-buffered prefetch) — the TPU never waits on numpy.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..utils.config import Config
from . import layout

FPS_AUG_STRIDES = (1, 2, 3, 4, 5, 6, 8, 10, 12)  # utils_motion_vae.py:70


def random_rotation_matrices(rng: np.random.Generator, n: int) -> np.ndarray:
    """Uniform random rotations, Graphics-Gems method, vectorised.

    Same distribution as ``rand_rotation_matrix`` (``utils_motion_vae.py:17-57``)
    with ``deflection=1``.
    """
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(0, 2, n)
    r = np.sqrt(z)
    V = np.stack([np.sin(phi) * r, np.cos(phi) * r, np.sqrt(2.0 - z)], axis=1)
    st, ct = np.sin(theta), np.cos(theta)
    Rz = np.zeros((n, 3, 3))
    Rz[:, 0, 0], Rz[:, 0, 1] = ct, st
    Rz[:, 1, 0], Rz[:, 1, 1] = -st, ct
    Rz[:, 2, 2] = 1.0
    H = np.einsum("ni,nj->nij", V, V) - np.eye(3)
    return (H @ Rz).astype(np.float32)


class MotionDataset:
    """In-memory sequence store + batch sampler."""

    def __init__(
        self,
        seq_dir: str,
        index_json: str,
        mean_std: np.ndarray,
        train_seq_len: int,
        fps_aug: bool = False,
        random_root_rot: bool = False,
        seed: int = 0,
    ):
        with open(index_json) as f:
            ids = json.load(f)
        self.names = [ids[k] for k in sorted(ids, key=int)]
        self.seqs: List[np.ndarray] = [
            np.load(os.path.join(seq_dir, n)).astype(np.float32)
            for n in self.names
        ]
        self.mean = mean_std[0]
        self.std = np.where(mean_std[1] == 0, 1.0, mean_std[1])
        self.train_seq_len = train_seq_len
        self.fps_aug = fps_aug
        self.random_root_rot = random_root_rot
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.seqs)

    # ------------------------------------------------------------------
    def _sample_window(self, idx: int, rng=None) -> np.ndarray:
        """(T_win, 579) raw window with fps augmentation and retries
        (utils_motion_vae.py:65-81, 136-141)."""
        rng = self.rng if rng is None else rng
        L = self.train_seq_len
        for _ in range(20):
            seq = self.seqs[idx]
            if self.fps_aug:
                for _ in range(10):
                    stride = int(rng.choice(FPS_AUG_STRIDES))
                    cand = seq[::stride]
                    if cand.shape[0] >= L:
                        seq = cand
                        break
            if seq.shape[0] >= L:
                t0 = int(rng.integers(0, seq.shape[0] - L + 1))
                return seq[t0 : t0 + L]
            idx = int(rng.integers(0, len(self.seqs)))
        raise ValueError("no sequence long enough for train_seq_len")

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        idxs = self.rng.integers(0, len(self.seqs), batch_size)
        raw = np.stack([self._sample_window(int(i)) for i in idxs])  # (B,T,579)
        return self._finalize(raw)

    def _finalize(self, raw: np.ndarray) -> Dict[str, np.ndarray]:
        B, T, _ = raw.shape
        norm = (raw - self.mean) / self.std
        batch = {
            "rot_6d": raw[..., layout.ROT6D].reshape(B, T, 24, 6),
            "rot_mat": raw[..., layout.ROTMAT].reshape(B, T, 24, 3, 3),
            "rot_pos": raw[..., layout.COORD].reshape(B, T, 24, 3),
            "joint_pos": norm[..., layout.COORD].reshape(B, T, 24, 3),
            "linear_v": norm[..., layout.LINEAR_V].reshape(B, T, 24, 3),
            "angular_v": norm[..., layout.ANGULAR_V].reshape(B, T, 24, 3),
            "root_v": norm[..., layout.ROOT_V],
        }
        if self.random_root_rot:
            self._augment_root_rot(batch, raw)
        return batch

    def _augment_root_rot(self, batch: Dict[str, np.ndarray], raw: np.ndarray):
        """Random global-orientation augmentation, vectorised over the batch.

        Premultiplies a per-sample uniform rotation onto the root joint's
        rotation and the root velocity, re-standardises root_v, and rebuilds
        the 6D rep from the rotated matrices (utils_motion_vae.py:161-185).
        """
        B, T = raw.shape[:2]
        R = random_rotation_matrices(self.rng, B)  # (B,3,3)
        rot_mat = batch["rot_mat"]
        new_root = np.einsum("bij,btjk->btik", R, rot_mat[:, :, 0])
        rot_mat = rot_mat.copy()
        rot_mat[:, :, 0] = new_root
        batch["rot_mat"] = rot_mat
        # 6D regenerated from (possibly rotated) matrices
        batch["rot_6d"] = np.concatenate(
            (rot_mat[..., :, 0], rot_mat[..., :, 1]), axis=-1
        )
        raw_root_v = raw[..., layout.ROOT_V]  # unnormalised
        aug_root_v = np.einsum("bij,btj->bti", R, raw_root_v)
        mean = self.mean[layout.ROOT_V]
        std = self.std[layout.ROOT_V]
        batch["root_v"] = (aug_root_v - mean) / std

    # ------------------------------------------------------------------
    def iter_batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.sample_batch(batch_size)

    def ordered_batches(self, batch_size: int, max_batches: int = 50,
                        seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Deterministic sequential validation batches.

        The reference validates over an *ordered* val DataLoader
        (shuffle=False, ``utils_motion_vae.py:219-224``,
        ``train_motion_vae.py:98-110``); sequences are walked in index order
        and window choice comes from a fresh per-call rng, so every
        validation pass — and every run — evaluates the identical windows.
        Augmentation is skipped (eval-mode data).
        """
        rng = np.random.default_rng(seed)
        n = len(self.seqs)
        total = min(max_batches * batch_size, max(n, batch_size))
        for b0 in range(0, total - batch_size + 1, batch_size):
            # eval-mode: both augmentations off (fps stride subsampling AND
            # random root rotation), so val loss is measured on clean windows
            fps, self.fps_aug = self.fps_aug, False
            aug, self.random_root_rot = self.random_root_rot, False
            try:
                raw = np.stack([
                    self._sample_window((b0 + j) % n, rng)
                    for j in range(batch_size)
                ])
                yield self._finalize(raw)
            finally:
                self.fps_aug = fps
                self.random_root_rot = aug


class EvalMotionDataset:
    """Full-sequence eval loader with per-joint visibility masks.

    Mirrors ``EvalMotionSeqData`` (``utils_motion_vae.py:234-318``): returns
    unnormalised rot6d/rotmat/pos plus masked copies and the (T, 24) mask.
    """

    UPPER_JOINTS = (0, 3, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23)
    LOWER_JOINTS = (1, 2, 4, 5, 7, 8, 10, 11)

    def __init__(self, seq_dir: str, index_json: str,
                 missing: str = "none", missing_joint_prob: float = 0.0,
                 mask_dir: Optional[str] = None, seed: int = 0):
        """``mask_dir``: optional folder of precomputed per-frame (T, 24) mask
        npys named like the sequences (the reference's
        ``all_amass_data_motion_noisy_data_for_eval/<prob>/`` layout,
        ``utils_motion_vae.py:247,276-277``); otherwise ``missing='random'``
        draws masks from ``missing_joint_prob`` with this instance's seed."""
        with open(index_json) as f:
            ids = json.load(f)
        self.names = [ids[k] for k in sorted(ids, key=int)]
        self.seq_dir = seq_dir
        self.missing = missing
        self.missing_joint_prob = missing_joint_prob
        self.mask_dir = mask_dir
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        seq = np.load(os.path.join(self.seq_dir, self.names[i])).astype(np.float32)
        T = seq.shape[0]
        rot6d = seq[:, layout.ROT6D].reshape(T, 24, 6)
        rotmat = seq[:, layout.ROTMAT].reshape(T, 24, 3, 3)
        pos = seq[:, layout.COORD].reshape(T, 24, 3)
        root_v = seq[:, layout.ROOT_V]

        mask = np.ones((T, 24), dtype=np.float32)
        if self.missing == "upper":
            mask[:, list(self.UPPER_JOINTS)] = 0.0
        elif self.missing == "lower":
            mask[:, list(self.LOWER_JOINTS)] = 0.0
        elif self.mask_dir is not None:
            mask = np.load(
                os.path.join(self.mask_dir, self.names[i])
            ).astype(np.float32)[:T]
        elif self.missing == "random":
            mask = (self.rng.random((T, 24)) >= self.missing_joint_prob
                    ).astype(np.float32)

        m6 = rot6d * mask[..., None]
        mm = rotmat * mask[..., None, None]
        mp = pos * mask[..., None]
        return {
            "name": self.names[i], "rot_6d": rot6d, "rot_mat": rotmat,
            "rot_pos": pos, "masked_6d": m6, "masked_rot": mm,
            "masked_pos": mp, "mask": mask, "root_v": root_v,
        }


class PrefetchIterator:
    """Background-thread prefetch of host batches (bounded queue)."""

    def __init__(self, it: Iterator, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def worker():
            for item in it:
                if self._stop.is_set():
                    return
                self.q.put(item)

        self.t = threading.Thread(target=worker, daemon=True)
        self.t.start()

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()

    def close(self):
        self._stop.set()


def resolve_split_json(cfg: Config, split: str,
                       data_dir: Optional[str] = None) -> str:
    """Resolve the ``split`` manifest path: DataConfig.{split}_json first.

    ``"reference"`` selects the vendored historical manifest
    (:func:`~hm_vae_tpu.data.layout.reference_split_path` — the reference's
    literal 10818/363/140 file inventory); otherwise the field is tried as a
    path (as given, then relative to the data dir — this is how the
    reference-named ``*_all_amass_motion_data.json`` defaults resolve when
    present); fallback is the prep-generated ``{split}.json``.

    The fallback applies ONLY to the dataclass-default field value: an
    explicitly configured manifest that does not exist raises instead of
    silently evaluating a different file inventory (the point of the
    ``--split_json`` surface is byte-reproducible split selection).
    """
    d = data_dir or cfg.data.data_root
    field = getattr(cfg.data, f"{split}_json", "")
    if field == "reference":
        return layout.reference_split_path(split)
    candidates = (field, os.path.join(d, field)) if field else ()
    for cand in candidates:
        if os.path.exists(cand):
            return cand
    default = type(cfg.data).__dataclass_fields__[f"{split}_json"].default
    if field and field != default:
        raise FileNotFoundError(
            f"configured data.{split}_json does not exist (tried "
            f"{list(candidates)})")
    return os.path.join(d, f"{split}.json")


def make_loaders(cfg: Config, data_dir: Optional[str] = None):
    """(train, val, test) MotionDatasets from a processed/synthetic data dir.

    If ``cfg.data.synthetic`` (or the directory is missing) a synthetic dataset
    is generated on the fly — no hard-coded machine paths (the reference's
    biggest portability bug, ``utils_motion_vae.py:194-206``).
    """
    from . import synthetic

    d = data_dir or cfg.data.data_root

    def _index_path(split: str) -> str:
        return resolve_split_json(cfg, split, d)

    if cfg.data.synthetic or not os.path.exists(_index_path("train")):
        os.makedirs(d, exist_ok=True)
        if not os.path.exists(os.path.join(d, "train.json")):
            # multi-host: the data root is shared, so only process 0 writes
            # (concurrent generators would race on the same files) and the
            # rest block on a pod barrier until the dataset is complete
            from ..parallel import multihost as mh

            if mh.is_primary():
                synthetic.generate_dataset(
                    d, num_seqs=cfg.data.synthetic_num_seqs,
                    seed=cfg.run.seed)
            if mh.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("hmvae_synthetic_data")
    seq_dir = os.path.join(d, "seqs")
    ms_path = os.path.join(d, "mean_std.npy")
    mean_std = (
        np.load(ms_path).astype(np.float32)
        if os.path.exists(ms_path) else layout.load_mean_std(cfg.data.mean_std_path)
    )
    mean_std[1, mean_std[1] == 0] = 1.0

    # with device_augment (default) the Trainer applies random_root_rot as a
    # jitted per-batch op in its TRAIN ingest, so the HOST samplers stay
    # aug-free and the C++ fast path stays eligible; device_augment=False
    # keeps the reference-style numpy aug in the sampler.  Either way
    # validation is identical: ordered_batches() forces both augs off (the
    # documented round-2 deviation — the reference builds val/test
    # MotionSeqData WITH the train augs, utils_motion_vae.py:220-228, making
    # its val loss a noisy sample; ours measures clean windows), so the val
    # split never sees the aug through either path.
    host_aug = cfg.data.random_root_rot_flag and not cfg.data.device_augment

    def mk(split, seed):
        return MotionDataset(
            seq_dir, _index_path(split), mean_std,
            cfg.model.train_seq_len, fps_aug=cfg.data.fps_aug_flag,
            random_root_rot=host_aug, seed=seed,
        )

    # multi-host: each process's TRAIN sampler draws from a disjoint stream
    # (windows are sampled iid, so distinct per-process seeds ARE the data
    # partition); val/test keep the base seeds so every process enumerates
    # identical ordered eval windows (the trainer row-shards them).
    # Identity single-process.
    from ..parallel.multihost import process_seed

    train_seed = process_seed(cfg.run.seed)
    train = mk("train", train_seed)
    if cfg.data.use_native_loader and not host_aug:
        try:
            from .native_loader import NativeMotionLoader

            native = NativeMotionLoader(
                seq_dir, _index_path("train"), mean_std,
                cfg.model.train_seq_len, fps_aug=cfg.data.fps_aug_flag,
                seed=train_seed,
            )
            native.mean, native.std = train.mean, train.std
            train = native
        except Exception as e:
            import logging

            logging.getLogger(__name__).warning(
                "native C++ loader unavailable, falling back to the numpy "
                "sampler (~2x slower end-to-end on loader-bound hosts): %r", e)
    return train, mk("val", cfg.run.seed + 1), mk("test", cfg.run.seed + 2)
