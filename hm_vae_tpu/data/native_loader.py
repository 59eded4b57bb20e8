"""ctypes bindings for the native C++ batch sampler (hm_vae_tpu/native/loader.cpp).

Builds the shared library on first use (g++ -O3) and falls back to the numpy
:class:`~hm_vae_tpu.data.dataset.MotionDataset` sampler if the toolchain is
unavailable — identical batch contract either way.

The build artifact lives in a per-CPU-model cache directory (override with
``HM_VAE_TPU_NATIVE_BUILD_DIR``), NOT next to the source: the source tree may
be a read-only site-packages install, and a ``-march=native`` binary carried
across a host migration can die with SIGILL — keying the cache by
/proc/cpuinfo invalidates it exactly when the microarchitecture changes (the
same pathology as the JAX CPU compile-cache poisoning handled in
tests/conftest.py).
"""

from __future__ import annotations

import ctypes
import json
import logging
import os
import subprocess
from typing import Dict, Optional

import numpy as np

from . import layout

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")

_lib = None


def _build_dir() -> str:
    env = os.environ.get("HM_VAE_TPU_NATIVE_BUILD_DIR")
    if env:
        return env
    try:
        with open("/proc/cpuinfo", "rb") as f:
            import hashlib

            cpu_key = hashlib.sha1(f.read()).hexdigest()[:12]
    except OSError:
        cpu_key = "nocpuinfo"
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "hm_vae_tpu", f"native_{cpu_key}")


def _build_library() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "loader.cpp")
    if not os.path.exists(src):
        return None
    lib_path = os.path.join(_build_dir(), "libmotion_loader.so")
    os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    if (os.path.exists(lib_path)
            and os.path.getmtime(lib_path) >= os.path.getmtime(src)):
        return lib_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o",
           lib_path, src, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        # a toolchain regression silently dropping e2e throughput ~2x is a
        # bug, not a fallback — carry the compiler's own error
        log.warning("native loader C++ build failed (%s): %s",
                    " ".join(cmd),
                    (e.stderr or b"").decode(errors="replace").strip())
        return None
    except Exception as e:
        log.warning("native loader C++ build failed: %r", e)
        return None
    return lib_path


def get_library():
    global _lib
    if _lib is not None:
        return _lib
    path = _build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ml_open.restype = ctypes.c_void_p
    lib.ml_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.ml_num_seqs.restype = ctypes.c_int64
    lib.ml_num_seqs.argtypes = [ctypes.c_void_p]
    lib.ml_sample_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ml_sample_batch_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.ml_sample_fields_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int] + [ctypes.POINTER(ctypes.c_float)] * 7 + [ctypes.c_int]
    lib.ml_sample_compact_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.ml_sample_compact_slice_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64]
    lib.ml_build_aa.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ml_sample_compact_aa_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.ml_start_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.ml_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ml_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeMotionLoader:
    """Drop-in window sampler backed by the C++ library.

    Produces the same 7-field batch dict as
    :class:`hm_vae_tpu.data.dataset.MotionDataset`.
    """

    def __init__(self, seq_dir: str, index_json: str, mean_std: np.ndarray,
                 train_seq_len: int, fps_aug: bool = False, seed: int = 0):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self.lib = lib
        with open(index_json) as f:
            ids = json.load(f)
        names = [ids[k] for k in sorted(ids, key=int)]
        paths = [os.path.join(seq_dir, n).encode() for n in names]
        arr = (ctypes.c_char_p * len(paths))(*paths)
        mean = np.ascontiguousarray(mean_std[0], np.float32)
        std = np.ascontiguousarray(mean_std[1], np.float32)
        self.handle = lib.ml_open(arr, len(paths), _fptr(mean), _fptr(std),
                                  layout.FRAME_DIM)
        if not self.handle:
            raise RuntimeError("failed to load sequences natively")
        self.train_seq_len = train_seq_len
        self.fps_aug = fps_aug
        self.seed = seed
        self._counter = 0
        self._prefetching = False

    def __len__(self):
        return int(self.lib.ml_num_seqs(self.handle))

    def _to_batch(self, raw: np.ndarray, norm: np.ndarray) -> Dict[str, np.ndarray]:
        B, T = raw.shape[:2]
        return {
            "rot_6d": raw[..., layout.ROT6D].reshape(B, T, 24, 6),
            "rot_mat": raw[..., layout.ROTMAT].reshape(B, T, 24, 3, 3),
            "rot_pos": raw[..., layout.COORD].reshape(B, T, 24, 3),
            "joint_pos": norm[..., layout.COORD].reshape(B, T, 24, 3),
            "linear_v": norm[..., layout.LINEAR_V].reshape(B, T, 24, 3),
            "angular_v": norm[..., layout.ANGULAR_V].reshape(B, T, 24, 3),
            "root_v": norm[..., layout.ROOT_V],
        }

    def sample_batch(self, batch_size: int,
                     threads: int = 1) -> Dict[str, np.ndarray]:
        """Sample a batch with field buffers written directly by C++ —
        no Python-side slicing copies."""
        L = self.train_seq_len
        B = batch_size
        out = {
            "rot_6d": np.empty((B, L, 24, 6), np.float32),
            "rot_mat": np.empty((B, L, 24, 3, 3), np.float32),
            "rot_pos": np.empty((B, L, 24, 3), np.float32),
            "joint_pos": np.empty((B, L, 24, 3), np.float32),
            "linear_v": np.empty((B, L, 24, 3), np.float32),
            "angular_v": np.empty((B, L, 24, 3), np.float32),
            "root_v": np.empty((B, L, 3), np.float32),
        }
        self._counter += 1
        self.lib.ml_sample_fields_mt(
            self.handle, B, L, (self.seed << 20) + self._counter,
            int(self.fps_aug),
            _fptr(out["rot_6d"]), _fptr(out["rot_mat"]), _fptr(out["rot_pos"]),
            _fptr(out["joint_pos"]), _fptr(out["linear_v"]),
            _fptr(out["angular_v"]), _fptr(out["root_v"]), threads)
        return out

    def sample_superbatch(self, k: int, batch_size: int,
                          threads: int = 8) -> Dict[str, np.ndarray]:
        """(K, B, ...) stacked batches for multi-step dispatch, filled by a
        thread team in one native call."""
        flat = self.sample_batch(k * batch_size, threads=threads)
        return {
            key: v.reshape((k, batch_size) + v.shape[1:])
            for key, v in flat.items()
        }

    def sample_compact(self, batch_size: int, need_root_v: bool = False,
                       threads: int = 8,
                       out: Optional[Dict[str, np.ndarray]] = None,
                       wire: str = "rotmat") -> Dict[str, np.ndarray]:
        """Minimal-transfer batch (+ root_v).  ``out`` allows buffer reuse
        (avoids fresh-page faults on the hot path).

        ``wire``: "rotmat" transfers rot_mat (B,L,24,3,3); "rot6d" transfers
        rot_6d (B,L,24,6) — 33% fewer bytes, the device reconstructs the
        rotation matrix by Gram-Schmidt (exact for true rotations since the
        6D rep IS the first two matrix columns,
        utils/process_all_data_motion.py:136-137); "aa" transfers axis-angle
        (B,L,24,3) from a load-time sidecar (robust SO(3) log map in C++) —
        half the rot6d bytes again, reconstructed on device by Rodrigues."""
        L = self.train_seq_len
        B = batch_size
        if out is None:
            out = self._alloc_compact(B, need_root_v, wire)
        self._counter += 1
        rv = out.get("root_v")
        null = ctypes.POINTER(ctypes.c_float)()
        rvp = _fptr(rv) if rv is not None else null
        seed = (self.seed << 20) + self._counter
        if wire == "aa":
            self.lib.ml_sample_compact_aa_mt(
                self.handle, B, L, seed, int(self.fps_aug), _fptr(out["aa"]),
                rvp, threads)
            return out
        key = "rot_6d" if wire == "rot6d" else "rot_mat"
        off, width = ((layout.ROT6D.start, layout.ROT6D_DIM)
                      if wire == "rot6d"
                      else (layout.ROTMAT.start, layout.ROTMAT_DIM))
        self.lib.ml_sample_compact_slice_mt(
            self.handle, B, L, seed, int(self.fps_aug), _fptr(out[key]),
            rvp, threads, off, width)
        return out

    def _alloc_compact(self, B: int, need_root_v: bool, wire: str):
        L = self.train_seq_len
        if wire == "aa":
            out = {"aa": np.empty((B, L, 24, 3), np.float32)}
        elif wire == "rot6d":
            out = {"rot_6d": np.empty((B, L, 24, 6), np.float32)}
        else:
            out = {"rot_mat": np.empty((B, L, 24, 3, 3), np.float32)}
        if need_root_v:
            out["root_v"] = np.empty((B, L, 3), np.float32)
        return out

    def iter_compact_superbatches(self, k: int, batch_size: int,
                                  need_root_v: bool = False,
                                  threads: int = 8, wire: str = "rotmat"):
        """Double-buffered compact (K, B, ...) superbatch stream."""
        import threading

        B = k * batch_size

        bufs = [self._alloc_compact(B, need_root_v, wire),
                self._alloc_compact(B, need_root_v, wire)]
        self.sample_compact(B, need_root_v, threads, out=bufs[0], wire=wire)
        slot = 0
        while True:
            nxt = 1 - slot
            t = threading.Thread(
                target=self.sample_compact,
                args=(B, need_root_v, threads),
                kwargs={"out": bufs[nxt], "wire": wire},
                daemon=True)
            t.start()
            yield {
                key: v.reshape((k, batch_size) + v.shape[1:])
                for key, v in bufs[slot].items()
            }
            t.join()
            slot = nxt

    def _alloc_fields(self, B: int) -> Dict[str, np.ndarray]:
        L = self.train_seq_len
        return {
            "rot_6d": np.empty((B, L, 24, 6), np.float32),
            "rot_mat": np.empty((B, L, 24, 3, 3), np.float32),
            "rot_pos": np.empty((B, L, 24, 3), np.float32),
            "joint_pos": np.empty((B, L, 24, 3), np.float32),
            "linear_v": np.empty((B, L, 24, 3), np.float32),
            "angular_v": np.empty((B, L, 24, 3), np.float32),
            "root_v": np.empty((B, L, 3), np.float32),
        }

    def _fill_into(self, bufs: Dict[str, np.ndarray], threads: int):
        B = bufs["rot_6d"].shape[0]
        self._counter += 1
        self.lib.ml_sample_fields_mt(
            self.handle, B, self.train_seq_len,
            (self.seed << 20) + self._counter, int(self.fps_aug),
            _fptr(bufs["rot_6d"]), _fptr(bufs["rot_mat"]),
            _fptr(bufs["rot_pos"]), _fptr(bufs["joint_pos"]),
            _fptr(bufs["linear_v"]), _fptr(bufs["angular_v"]),
            _fptr(bufs["root_v"]), threads)

    def iter_superbatches(self, k: int, batch_size: int, threads: int = 8):
        """Double-buffered (K, B, ...) superbatch stream.

        Two reusable host buffer sets (no per-call page faults); the next
        superbatch fills on a background thread while the caller consumes the
        current one.  Caller must finish its device transfer before the
        second-next iteration.
        """
        import threading

        B = k * batch_size
        bufs = [self._alloc_fields(B), self._alloc_fields(B)]
        pending: list = [None, None]

        def fill(slot):
            self._fill_into(bufs[slot], threads)

        fill(0)
        slot = 0
        while True:
            nxt = 1 - slot
            t = threading.Thread(target=fill, args=(nxt,), daemon=True)
            t.start()
            pending[nxt] = t
            out = {
                key: v.reshape((k, batch_size) + v.shape[1:])
                for key, v in bufs[slot].items()
            }
            yield out
            t.join()
            slot = nxt

    def start_prefetch(self, batch_size: int, depth: int = 4,
                       threads: int = 2):
        self.lib.ml_start_prefetch(
            self.handle, batch_size, self.train_seq_len, depth, threads,
            self.seed + 1, int(self.fps_aug))
        self._prefetching = True
        self._pf_batch = batch_size

    def next_batch(self) -> Dict[str, np.ndarray]:
        assert self._prefetching
        L, D = self.train_seq_len, layout.FRAME_DIM
        raw = np.empty((self._pf_batch, L, D), np.float32)
        norm = np.empty((self._pf_batch, L, D), np.float32)
        self.lib.ml_next_batch(self.handle, _fptr(raw), _fptr(norm))
        return self._to_batch(raw, norm)

    def iter_batches(self, batch_size: int):
        if not self._prefetching:
            self.start_prefetch(batch_size)
        while True:
            yield self.next_batch()

    def close(self):
        if self.handle:
            self.lib.ml_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
