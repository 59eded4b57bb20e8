"""Motion completion / interpolation / generation on long sequences.

The reference's three applications differ only in mask construction and
stitching policy; here those are data and small host functions around the one
jitted solver in :mod:`hm_vae_tpu.apps.latent_opt`:

- **interpolation** (``final_long_seq_try_interpolation``,
  ``seq_two_hier_sa_vae.py:1270-1541``): non-overlapping windows, temporal
  keyframe mask.  Windows are *independent*, so all of them solve in ONE
  batched jit call — the reference optimizes them serially.
- **completion** (``final_motion_completion_long_seq``, ``:1543-1841``):
  per-joint visibility mask, windows at stride T-1 with the first frame pinned
  to the previous window's output — inherently sequential outer loop, jitted
  per-window solve.
- **generation** (``try_final_long_seq_generation``, ``:1096-1268``):
  autoregressive windows overlapping ``overlap=10`` frames; z is regularised
  toward its random initialisation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hm_vae import HMVAE
from ..ops import fk as fk_mod
from ..ops import rotations as rot
from ..utils.config import Config
from .latent_opt import (
    LatentOptResult, init_z, make_latent_optimizer, replace_with_target,
)

UPPER_JOINTS = (12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23)
LOWER_JOINTS = (0, 3, 6, 9, 1, 2, 4, 5, 7, 8, 10, 11)
# (seq_two_hier_sa_vae.py:1583-1584)


def _targets_from_rotmat(rotmat: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., T, 24, 3, 3) -> target dict with 6D and FK positions."""
    rotmat = jnp.asarray(rotmat)  # accept host numpy (the CLI path)
    six = rot.rotmat_to_rot6d(rotmat)
    pose = fk_mod.fk_from_rotmat(rotmat, fk_mod.default_offsets())
    return {"rot_6d": six, "rot_mat": rotmat, "pose": pose}


def _targets_from_rotmat_np(rotmat: np.ndarray) -> Dict[str, np.ndarray]:
    """Host-side variant for VARIABLE-LENGTH full sequences: un-jitted JAX
    ops dispatch per-op executables for every distinct T (tens of ms each
    over the TPU relay), which dominated full-split eval wall time; numpy
    does the same work in ~2 ms/sequence with no device round-trips."""
    rotmat = np.asarray(rotmat, np.float32)
    six = np.concatenate((rotmat[..., :, 0], rotmat[..., :, 1]), axis=-1)
    pose = np.asarray(fk_mod.fk_numpy(rotmat), np.float32)
    return {"rot_6d": six, "rot_mat": rotmat, "pose": pose}


def interpolation_mask(T: int, keyframe_every: int) -> np.ndarray:
    """Temporal keyframe mask (T,): 1 at keyframes, incl. the final frame
    (seq_two_hier_sa_vae.py:1300-1304)."""
    m = np.zeros(T, dtype=np.float32)
    m[::keyframe_every] = 1.0
    m[-1] = 1.0
    return m


def completion_joint_mask(missing: str) -> np.ndarray:
    """(24,) 1 = visible; missing='upper'|'lower' hides that body part
    (seq_two_hier_sa_vae.py:1586-1593)."""
    m = np.ones(24, dtype=np.float32)
    joints = UPPER_JOINTS if missing == "upper" else LOWER_JOINTS
    m[list(joints)] = 0.0
    return m


class LatentOptApps:
    """Bound (model, params) application runner."""

    def __init__(self, model: HMVAE, params, cfg: Config,
                 trajectory: Optional[tuple] = None,
                 mesh=None, data_axis: str = "data"):
        """trajectory: optional (traj_model, traj_params, mean_std) enabling
        the in-loop keyframe trajectory loss for interpolation when
        cfg.latent_opt.optimize_trajectory is set.

        mesh: optional :class:`jax.sharding.Mesh` — every batched solve's
        window batch is sharded over ``mesh[data_axis]`` (windows are
        independent solves, so the 150-step inner optimization scales
        embarrassingly data-parallel under GSPMD; the multichip dryrun
        asserts sharded == unsharded).  Batches not divisible by the axis
        size are padded by cycling real windows (padded outputs discarded).
        """
        self.model = model
        self.params = params
        self.cfg = cfg
        self.W = cfg.model.train_seq_len
        self._bsh = None
        self._n_data = 1
        self._replicate = None
        if mesh is not None and mesh.shape[data_axis] > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._n_data = mesh.shape[data_axis]
            self._bsh = NamedSharding(mesh, P(data_axis))
            # params replicate across the data axis (one device_put here,
            # reused by every solve)
            self.params = jax.device_put(params, NamedSharding(mesh, P()))
        self.solve = make_latent_optimizer(model, cfg)
        # completion phase-switches later than the other tasks
        # (prev_epochs 100 vs 50, seq_two_hier_sa_vae.py:1731 vs :1206/:1403)
        lat = cfg.latent_opt
        if lat.prev_epochs_completion != lat.prev_epochs:
            import dataclasses
            self.solve_completion = make_latent_optimizer(
                model, cfg, lat=dataclasses.replace(
                    lat, prev_epochs=lat.prev_epochs_completion))
        else:
            self.solve_completion = self.solve
        self._traj_solve = None
        if trajectory is not None and cfg.latent_opt.optimize_trajectory:
            key = tuple(np.nonzero(interpolation_mask(
                self.W, cfg.latent_opt.interpolation_window))[0])
            self._traj_solve = make_latent_optimizer(
                model, cfg, trajectory=trajectory, key_frames=key)

    # ------------------------------------------------------------------
    def _dispatch(self, solve, targets, mask, z_init, z_reg
                  ) -> LatentOptResult:
        """Run one batched solve; with a mesh, shard the window batch over
        the data axis (GSPMD inserts the collectives; windows are
        independent so sharded == unsharded, asserted by the dryrun).

        Batches not divisible by the axis size pad by cycling real windows
        (np.resize-style, the same policy as :meth:`interpolate_many`'s
        compile-stabilising pad) and the padded rows are trimmed from the
        result.  ``loss_history`` stays the PADDED batch mean in that case —
        it is a convergence diagnostic, not a metric.
        """
        if self._bsh is None:
            return solve(self.params, targets, mask, z_init, z_reg)
        n = self._n_data
        B = int(mask.shape[0])
        B_pad = -(-B // n) * n
        pc = jax.process_count()

        def put(x):
            if B_pad > B:
                x = np.asarray(x)
                x = np.concatenate([x, x[np.arange(B_pad - B) % B]])
            if pc == 1:
                return jax.device_put(x, self._bsh)
            # multi-host: every process computes the identical padded batch
            # (same eval data, same rng) and contributes its contiguous row
            # share — a plain device_put of host data onto a pod-spanning
            # sharding is not addressable
            x = np.asarray(x)
            rpp = B_pad // pc
            i = jax.process_index()
            return jax.make_array_from_process_local_data(
                self._bsh, x[i * rpp:(i + 1) * rpp])

        res = solve(self.params, {k: put(v) for k, v in targets.items()},
                    put(mask), [put(z) for z in z_init],
                    [put(z) for z in z_reg])
        if pc > 1:
            # replicate outputs so the host-side stitching (np.asarray in
            # every task method) reads locally on every process; the gather
            # is a symmetric collective launched by all processes
            if self._replicate is None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self._bsh.mesh, P())
                self._replicate = jax.jit(lambda r: r, out_shardings=rep)
            res = self._replicate(res)
        if B_pad == B:
            return res
        return LatentOptResult(
            last_6d=res.last_6d[:B], last_rotmat=res.last_rotmat[:B],
            last_pose=res.last_pose[:B], best_6d=res.best_6d[:B],
            best_rotmat=res.best_rotmat[:B], best_pose=res.best_pose[:B],
            final_loss=res.final_loss[:B], loss_history=res.loss_history)

    # ------------------------------------------------------------------
    def interpolate(self, rotmat_seq: jnp.ndarray, rng: jax.Array,
                    replace_with_gt: Optional[bool] = None,
                    root_trans: Optional[jnp.ndarray] = None,
                    restarts: int = 1) -> Dict:
        """Temporal interpolation of one long sequence.

        rotmat_seq: (T, 24, 3, 3).  Returns stitched (T', ...) outputs where
        T' = num_windows * W.  With ``root_trans`` (T, 3) and an
        optimize_trajectory-enabled runner, the keyframe trajectory loss is
        active.

        ``restarts > 1`` runs that many independent random z initialisations
        *per window* in the same batched solve and keeps each window's
        best-final-loss restart — effectively free on TPU (the batch axis was
        idle); the reference's serial loop cannot afford this.
        """
        lat = self.cfg.latent_opt
        W = self.W
        T = rotmat_seq.shape[0]
        n_win = T // W
        if n_win == 0:
            raise ValueError(f"sequence shorter than window: {T} < {W}")
        wins = rotmat_seq[: n_win * W].reshape(n_win, W, 24, 3, 3)

        R = max(1, restarts)
        wins = np.asarray(wins)
        if R > 1:
            wins_b = np.repeat(wins, R, axis=0)  # (n_win*R, W, 24, 3, 3)
        else:
            wins_b = wins
        # host-side targets: n_win varies per sequence, and per-op eager JAX
        # dispatch compiles relay executables for every distinct count
        targets = _targets_from_rotmat_np(wins_b)
        tmask = interpolation_mask(W, lat.interpolation_window)
        mask = jnp.asarray(np.tile(tmask[None, :, None], (n_win * R, 1, 24)))

        z_init = init_z(rng, self.cfg, n_win * R)
        z_reg = jax.tree.map(jnp.zeros_like, z_init)
        if self._traj_solve is not None and root_trans is not None:
            targets = dict(targets)
            rt = root_trans[: n_win * W].reshape(n_win, W, 3)
            targets["root_trans"] = (jnp.repeat(rt, R, axis=0) if R > 1 else rt)
            res: LatentOptResult = self._dispatch(
                self._traj_solve, targets, mask, z_init, z_reg)
            targets.pop("root_trans")
        else:
            res = self._dispatch(self.solve, targets, mask, z_init, z_reg)

        if R > 1:
            # keep each window's best restart
            per = res.final_loss.reshape(n_win, R)
            best = jnp.argmin(per, axis=1)  # (n_win,)
            sel = jnp.arange(n_win) * R + best

            def pick(x):
                return x[sel]

            res = LatentOptResult(
                last_6d=pick(res.last_6d), last_rotmat=pick(res.last_rotmat),
                last_pose=pick(res.last_pose), best_6d=pick(res.best_6d),
                best_rotmat=pick(res.best_rotmat), best_pose=pick(res.best_pose),
                final_loss=per.min(axis=1), loss_history=res.loss_history,
            )
            targets = _targets_from_rotmat_np(wins)
            mask = jnp.asarray(np.tile(tmask[None, :, None], (n_win, 1, 24)))

        out6d, outrot, outpose = res.last_6d, res.last_rotmat, res.last_pose
        if replace_with_gt if replace_with_gt is not None else lat.replace_frame_with_gt:
            out6d = replace_with_target(out6d, targets["rot_6d"], mask)
            outrot = replace_with_target(outrot, targets["rot_mat"], mask)
            outpose = replace_with_target(outpose, targets["pose"], mask)

        def stitch(x):
            return x.reshape((n_win * W,) + x.shape[2:])

        return {
            "rot_6d": stitch(out6d), "rot_mat": stitch(outrot),
            "pose": stitch(outpose), "mask": stitch(mask),
            "loss_history": res.loss_history,
        }

    # ------------------------------------------------------------------
    def interpolate_many(self, rotmat_seqs, rng: jax.Array,
                         pad_to_multiple: int = 32):
        """Temporal interpolation of MANY long sequences in ONE batched
        solve: every sequence's windows flatten into a single batch axis
        (windows are independent, cf. :meth:`complete_many` /
        :meth:`generate_many`).  The batch is padded up to a multiple of
        ``pad_to_multiple`` (cycling across all real windows so no single
        window gets extra weight in shared-clone mode; padded rows are
        discarded) so different chunks reuse one solver compile instead of
        recompiling per total window count.

        rotmat_seqs: list of (T_i, 24, 3, 3), each at least W frames.
        Returns a list of dicts shaped like :meth:`interpolate`'s output.
        """
        lat = self.cfg.latent_opt
        W = self.W
        seqs = [np.asarray(s, np.float32) for s in rotmat_seqs]
        n_wins = [s.shape[0] // W for s in seqs]
        short = [i for i, n in enumerate(n_wins) if n == 0]
        if short:
            raise ValueError(
                f"sequences {short} are shorter than one window (< {W})")
        wins = np.concatenate([
            s[: n * W].reshape(n, W, 24, 3, 3)
            for s, n in zip(seqs, n_wins)
        ])
        B = wins.shape[0]
        B_pad = -(-B // pad_to_multiple) * pad_to_multiple
        if B_pad > B:
            # cycle across ALL real windows (np.resize-style) rather than
            # repeating window 0: with a shared decoder clone, duplicate rows
            # add extra gradient weight to their source window, and repeating
            # only the first skewed every real sequence toward it
            wins = np.concatenate([wins, wins[np.arange(B_pad - B) % B]])
        targets = _targets_from_rotmat_np(wins)
        tmask = interpolation_mask(W, lat.interpolation_window)
        mask = jnp.asarray(np.tile(tmask[None, :, None], (B_pad, 1, 24)))

        z_init = init_z(rng, self.cfg, B_pad)
        z_reg = jax.tree.map(jnp.zeros_like, z_init)
        res = self._dispatch(self.solve, targets, mask, z_init, z_reg)

        out6d, outrot, outpose = res.last_6d, res.last_rotmat, res.last_pose
        if lat.replace_frame_with_gt:
            out6d = replace_with_target(out6d, targets["rot_6d"], mask)
            outrot = replace_with_target(outrot, targets["rot_mat"], mask)
            outpose = replace_with_target(outpose, targets["pose"], mask)

        outs = []
        o6, orm, op, msk = (np.asarray(out6d), np.asarray(outrot),
                            np.asarray(outpose), np.asarray(mask))
        off = 0
        for n in n_wins:
            sl = slice(off, off + n)

            def stitch(x):
                return x[sl].reshape((n * W,) + x.shape[2:])

            outs.append({
                "rot_6d": stitch(o6), "rot_mat": stitch(orm),
                "pose": stitch(op), "mask": stitch(msk),
            })
            off += n
        return outs

    # ------------------------------------------------------------------
    def interpolate_single_window(self, rotmat_wins: jnp.ndarray,
                                  rng: jax.Array,
                                  root_trans: Optional[jnp.ndarray] = None,
                                  ) -> Dict:
        """One-window temporal interpolation, batched across sequences.

        The reference's *intended* ``try_interpolation_single_window`` API
        (dispatched by ``eval_partial_motion_recovery.py:96-103`` with a
        trajectory trainer; the method is absent from the released model,
        ``trainer_motion_vae.py:214-215``).  rotmat_wins: (B, W, 24, 3, 3) —
        one window per test sequence, all solved in ONE batched call.
        With ``root_trans`` (B, W, 3) and an optimize_trajectory-enabled
        runner, the keyframe trajectory loss is active.
        """
        lat = self.cfg.latent_opt
        B, W = rotmat_wins.shape[:2]
        assert W == self.W, f"window length {W} != train_seq_len {self.W}"
        targets = _targets_from_rotmat(rotmat_wins)
        tmask = interpolation_mask(W, lat.interpolation_window)
        mask = jnp.asarray(np.tile(tmask[None, :, None], (B, 1, 24)))

        z_init = init_z(rng, self.cfg, B)
        z_reg = jax.tree.map(jnp.zeros_like, z_init)
        if self._traj_solve is not None and root_trans is not None:
            targets = dict(targets)
            targets["root_trans"] = jnp.asarray(root_trans)
            res = self._dispatch(self._traj_solve, targets, mask, z_init,
                                 z_reg)
            targets.pop("root_trans")
        else:
            res = self._dispatch(self.solve, targets, mask, z_init, z_reg)

        out6d, outrot, outpose = res.last_6d, res.last_rotmat, res.last_pose
        if lat.replace_frame_with_gt:
            out6d = replace_with_target(out6d, targets["rot_6d"], mask)
            outrot = replace_with_target(outrot, targets["rot_mat"], mask)
            outpose = replace_with_target(outpose, targets["pose"], mask)
        return {"rot_6d": out6d, "rot_mat": outrot, "pose": outpose,
                "mask": mask, "loss_history": res.loss_history}

    # ------------------------------------------------------------------
    def complete_single_window(self, rotmat_wins: jnp.ndarray,
                               masks: jnp.ndarray, rng: jax.Array) -> Dict:
        """One-window motion completion, batched across sequences.

        The reference's *intended* ``final_motion_completion_single_window``
        API (dispatched with ``random_missing_joints=True`` by
        ``eval_partial_motion_recovery.py:117-127``; the method is absent from
        the released model, ``trainer_motion_vae.py:225-229``).

        rotmat_wins: (B, W, 24, 3, 3); masks: (B, W, 24) visibility (1 =
        visible) — per-frame random joint masks (``missing_joint_prob``) or
        fixed body-part masks both fit this contract.
        """
        lat = self.cfg.latent_opt
        B, W = rotmat_wins.shape[:2]
        assert W == self.W, f"window length {W} != train_seq_len {self.W}"
        targets = _targets_from_rotmat(rotmat_wins)
        mask = jnp.asarray(masks)

        z_init = init_z(rng, self.cfg, B)
        z_reg = jax.tree.map(jnp.zeros_like, z_init)
        res = self._dispatch(self.solve_completion, targets, mask, z_init,
                             z_reg)

        out6d, outrot, outpose = res.last_6d, res.last_rotmat, res.last_pose
        if lat.replace_part_with_gt:
            out6d = replace_with_target(out6d, targets["rot_6d"], mask)
            outrot = replace_with_target(outrot, targets["rot_mat"], mask)
            outpose = replace_with_target(outpose, targets["pose"], mask)
        return {"rot_6d": out6d, "rot_mat": outrot, "pose": outpose,
                "mask": mask, "loss_history": res.loss_history}

    # ------------------------------------------------------------------
    def complete(self, rotmat_seq: jnp.ndarray, rng: jax.Array,
                 missing: str = "lower") -> Dict:
        """Body-part completion over a long sequence with 1-frame stitching."""
        lat = self.cfg.latent_opt
        W = self.W
        overlap = 1
        stride = W - overlap
        T = rotmat_seq.shape[0]

        joint_mask = completion_joint_mask(missing)
        full = _targets_from_rotmat_np(np.asarray(rotmat_seq))

        acc = None  # dict of stitched outputs
        w_idx = 0
        for t0 in range(0, T, stride):
            if t0 + W > T:
                break  # final partial window dropped (reference :1654-1655)
            # copy: the slices VIEW the full-sequence numpy arrays and the
            # overlap pin below writes into them
            tgt = {k: np.array(v[None, t0 : t0 + W]) for k, v in full.items()}
            mask = np.tile(joint_mask[None, :], (W, 1))
            if acc is not None:
                # pin frame 0 to the previous window's full output
                mask[:overlap] = 1.0
                for k, prev in (("rot_6d", acc["rot_6d"]),
                                ("rot_mat", acc["rot_mat"]),
                                ("pose", acc["pose"])):
                    tgt[k][0, :overlap] = np.asarray(prev[-overlap:])
            mask = jnp.asarray(mask)[None]

            z_init = init_z(jax.random.fold_in(rng, w_idx), self.cfg, 1)
            z_reg = jax.tree.map(jnp.zeros_like, z_init)
            res = self._dispatch(self.solve_completion, tgt, mask, z_init,
                                 z_reg)

            out = {"rot_6d": res.last_6d, "rot_mat": res.last_rotmat,
                   "pose": res.last_pose}
            if lat.replace_part_with_gt:
                out = {
                    "rot_6d": replace_with_target(out["rot_6d"], tgt["rot_6d"], mask),
                    "rot_mat": replace_with_target(out["rot_mat"], tgt["rot_mat"], mask),
                    "pose": replace_with_target(out["pose"], tgt["pose"], mask),
                }
            out = {k: v[0] for k, v in out.items()}
            if acc is None:
                acc = out
            else:
                acc = {k: jnp.concatenate((acc[k], out[k][overlap:]), axis=0)
                       for k in acc}
            w_idx += 1
        if acc is None:
            raise ValueError(f"sequence shorter than window: {T} < {W}")
        return acc

    # ------------------------------------------------------------------
    def complete_many(self, rotmat_seqs, rng: jax.Array,
                      missing: str = "lower"):
        """Body-part completion of MANY long sequences, batched per window.

        Windows within a sequence are inherently sequential (frame 0 pins to
        the previous window's output, ``seq_two_hier_sa_vae.py:1626-1652``),
        but the same window index across sequences is independent — so the
        outer loop runs ``max_windows`` batched solves instead of
        ``sum(windows_i)`` single-sequence solves.  Sequences with fewer
        windows than the longest ride along on repeated data (fixed shapes,
        one compile) and their padded outputs are discarded at stitch time.

        rotmat_seqs: list of (T_i, 24, 3, 3) arrays, each at least one window
        (W frames) long.  Returns a list of dicts shaped like
        :meth:`complete`'s output, one per input sequence.
        """
        lat = self.cfg.latent_opt
        W = self.W
        overlap = 1
        stride = W - overlap
        seqs = [np.asarray(s) for s in rotmat_seqs]
        counts = [max(0, (s.shape[0] - W) // stride + 1) for s in seqs]
        short = [i for i, c in enumerate(counts) if c == 0]
        if short:
            raise ValueError(
                f"sequences {short} are shorter than one window "
                f"({[seqs[i].shape[0] for i in short]} < {W} frames); filter "
                "them out before calling complete_many")
        n_max = max(counts)
        B = len(seqs)
        joint_mask = completion_joint_mask(missing)
        fulls = [_targets_from_rotmat_np(s) for s in seqs]

        accs = [None] * B
        for w in range(n_max):
            tgt = {k: np.zeros((B, W) + fulls[0][k].shape[1:], np.float32)
                   for k in ("rot_6d", "rot_mat", "pose")}
            mask = np.tile(joint_mask[None, None, :], (B, W, 1))
            for b, (full, cnt) in enumerate(zip(fulls, counts)):
                t0 = min(w, max(cnt - 1, 0)) * stride  # clamp = repeat last
                for k in tgt:
                    tgt[k][b] = full[k][t0 : t0 + W]
                if accs[b] is not None and w < cnt:
                    mask[b, :overlap] = 1.0
                    for k in ("rot_6d", "rot_mat", "pose"):
                        tgt[k][b, :overlap] = np.asarray(
                            accs[b][k][-overlap:])
            tgt = {k: jnp.asarray(v) for k, v in tgt.items()}
            maskj = jnp.asarray(mask)

            z_init = init_z(jax.random.fold_in(rng, w), self.cfg, B)
            z_reg = jax.tree.map(jnp.zeros_like, z_init)
            res = self._dispatch(self.solve_completion, tgt, maskj, z_init,
                                 z_reg)

            out = {"rot_6d": res.last_6d, "rot_mat": res.last_rotmat,
                   "pose": res.last_pose}
            if lat.replace_part_with_gt:
                out = {k: replace_with_target(out[k], tgt[k], maskj)
                       for k in out}
            for b, cnt in enumerate(counts):
                if w >= cnt:
                    continue
                ob = {k: out[k][b] for k in out}
                if accs[b] is None:
                    accs[b] = ob
                else:
                    accs[b] = {k: jnp.concatenate(
                        (accs[b][k], ob[k][overlap:]), axis=0) for k in ob}
        return accs

    # ------------------------------------------------------------------
    def generate(self, seed_rotmat: jnp.ndarray, rng: jax.Array,
                 num_windows: int = 5, overlap: int = 10) -> Dict:
        """Autoregressive long-sequence generation from a seed window.

        seed_rotmat: (W, 24, 3, 3) starting motion (e.g. a GT window).
        Output sequence grows by (W - overlap) frames per window.
        """
        W = self.W
        six = rot.rotmat_to_rot6d(seed_rotmat)
        pose = fk_mod.fk_from_rotmat(seed_rotmat, fk_mod.default_offsets())
        whole = {"rot_6d": six, "rot_mat": seed_rotmat, "pose": pose}

        tmask = np.zeros(W, dtype=np.float32)
        tmask[:overlap] = 1.0
        mask = jnp.asarray(np.tile(tmask[:, None], (1, 24)))[None]

        for w in range(num_windows):
            pad = W - overlap
            tgt = {
                "rot_6d": jnp.concatenate(
                    (whole["rot_6d"][-overlap:], jnp.zeros((pad, 24, 6))), 0)[None],
                "rot_mat": jnp.concatenate(
                    (whole["rot_mat"][-overlap:], jnp.zeros((pad, 24, 3, 3))), 0)[None],
                "pose": jnp.concatenate(
                    (whole["pose"][-overlap:], jnp.zeros((pad, 24, 3))), 0)[None],
            }
            z_init = init_z(jax.random.fold_in(rng, w), self.cfg, 1)
            # generation regularises z toward its random init
            # (seq_two_hier_sa_vae.py:1150-1154)
            z_reg = z_init
            res = self._dispatch(self.solve, tgt, mask, z_init, z_reg)
            whole = {
                "rot_6d": jnp.concatenate(
                    (whole["rot_6d"], res.last_6d[0, overlap:]), 0),
                "rot_mat": jnp.concatenate(
                    (whole["rot_mat"], res.last_rotmat[0, overlap:]), 0),
                "pose": jnp.concatenate(
                    (whole["pose"], res.last_pose[0, overlap:]), 0),
            }
        return whole

    # ------------------------------------------------------------------
    def generate_many(self, seed_rotmats, rng: jax.Array,
                      num_windows: int = 5, overlap: int = 10):
        """Autoregressive generation from MANY seed windows, batched per
        round: window w depends on window w-1 *within* a sequence but is
        independent *across* sequences, so each round solves all sequences'
        w-th windows in ONE batched call — ``num_windows`` solves total
        instead of ``B * num_windows`` (cf. :meth:`complete_many`).

        seed_rotmats: list/array of (W, 24, 3, 3) seeds.  Returns a list of
        per-sequence dicts shaped like :meth:`generate`'s output.
        """
        W = self.W
        seeds = np.stack([np.asarray(s, np.float32) for s in seed_rotmats])
        B = seeds.shape[0]
        whole = _targets_from_rotmat_np(seeds)  # dict of (B, W, ...)

        tmask = np.zeros(W, dtype=np.float32)
        tmask[:overlap] = 1.0
        mask = jnp.asarray(np.tile(tmask[None, :, None], (B, 1, 24)))
        pad = W - overlap

        for w in range(num_windows):
            tgt = {
                k: np.concatenate(
                    (whole[k][:, -overlap:],
                     np.zeros((B, pad) + whole[k].shape[2:], np.float32)),
                    axis=1)
                for k in ("rot_6d", "rot_mat", "pose")
            }
            z_init = init_z(jax.random.fold_in(rng, w), self.cfg, B)
            z_reg = z_init  # regularised toward init, as in generate()
            res = self._dispatch(self.solve, tgt, mask, z_init, z_reg)
            out = {"rot_6d": res.last_6d, "rot_mat": res.last_rotmat,
                   "pose": res.last_pose}
            whole = {
                k: np.concatenate(
                    (whole[k], np.asarray(out[k])[:, overlap:]), axis=1)
                for k in whole
            }
        return [{k: v[b] for k, v in whole.items()} for b in range(B)]
