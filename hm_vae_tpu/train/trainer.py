"""Trainer: model factory, sharded step, checkpointing, run loop.

Replaces the reference ``Trainer`` (``trainer_motion_vae.py:15-237``) and the
driver loop in ``train_motion_vae.py:79-163``:

- model factory by ``cfg.model.model_name`` (``trainer_motion_vae.py:19-22``);
- orbax checkpoints of (params, opt_state, step) — the step lives *in* the
  checkpoint instead of being parsed out of the filename
  (``trainer_motion_vae.py:102-110``);
- explicit metric dict logging every ``log_iter``; validation every
  ``validation_iter`` (<= 50 val batches, ``train_motion_vae.py:98-110``);
- SPMD over a data mesh (DataParallel replacement).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import MotionDataset, PrefetchIterator, make_loaders
from ..models.hm_vae import HMVAE, dense_kernel_init
from ..models.trajectory import TrajectoryModel, trajectory_losses
from ..parallel import multihost as mh
from ..parallel import sharding as sh
from ..utils.config import Config
from ..utils.logging import MetricWriter, NullMetricWriter, make_result_folders
from .losses import hmvae_forward
from .optim import make_optimizer
from .train_step import TrainState

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


class Trainer:
    def __init__(self, cfg: Config, output_dir: str = "outputs/run",
                 mesh=None, mean_std: Optional[np.ndarray] = None):
        self.cfg = cfg
        if cfg.run.matmul_precision != "default":
            # process-wide by design: every jit trace in this run (train,
            # validation, apps sharing the process) should use the same
            # arithmetic.  See RunConfig.matmul_precision.
            jax.config.update("jax_default_matmul_precision",
                              cfg.run.matmul_precision)
        self.output_dir = output_dir
        self.ckpt_dir, self.image_dir = make_result_folders(output_dir)
        # multi-host: only process 0 writes metrics/checkpoints/animations
        # (they are replicated — the loss is a global-batch mean under GSPMD)
        self.writer = (MetricWriter(os.path.join(output_dir, "logs"))
                       if mh.is_primary() else NullMetricWriter())
        self._save_thread = None   # in-flight async checkpoint writer
        self._save_error = None
        self._snapshot_fn = None
        if mesh is None:
            # (data, model) mesh from the run config: `model` axis from
            # run.model_parallel, the data-parallel degree must divide the
            # global batch
            import math

            mp = max(1, cfg.run.model_parallel)
            nd = len(jax.devices())
            if nd % mp != 0:
                raise ValueError(
                    f"model_parallel={mp} does not divide the "
                    f"{nd} available devices")
            n = math.gcd(nd // mp, cfg.optim.batch_size)
            mesh = sh.make_mesh(max(n, 1) * mp, model_parallel=mp)
        self.mesh = mesh
        self.mean_std = mean_std

        name = cfg.model.model_name
        # fail fast on an unknown `init:` scheme (reference dispatch,
        # trainer_motion_vae.py:264-283) rather than inside the init trace
        dense_kernel_init(cfg.optim.init)
        if name == "TrajectoryModel":
            self.model = TrajectoryModel(cfg.model, init_type=cfg.optim.init)
        elif name == "TwoHierSAVAEModel":
            self.model = HMVAE(cfg.model, init_type=cfg.optim.init)
        else:
            raise ValueError(f"unknown model_name: {name}")

        self.tx = make_optimizer(cfg.optim)
        rng = jax.random.PRNGKey(cfg.run.seed)
        self.state, self.shardings = self._create_state(rng)
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        logging.getLogger(__name__).info(
            "%s: %.2fM params (param_layout=%s), mesh=%s", name,
            n_params / 1e6, cfg.model.param_layout, dict(self.mesh.shape))
        self._step_fn = None
        self._eval_fn = None

    # ------------------------------------------------------------------
    def _init_params(self, rng):
        m = self.cfg.model
        if isinstance(self.model, TrajectoryModel):
            c0 = 3 if m.trajectory_input_joint_pos else m.input_dim
            dummy = jnp.zeros((2, m.train_seq_len, m.n_joints, c0))
        else:
            dummy = jnp.zeros((2, m.train_seq_len, m.n_joints, m.input_dim))
        return self.model.init(rng, dummy)

    def _create_state(self, rng):
        from .train_step import cast_params

        def build(r):
            params = cast_params(self._init_params(r),
                                 self.cfg.optim.param_dtype)
            return TrainState(params=params, opt_state=self.tx.init(params),
                              step=jnp.zeros((), jnp.int32))

        state_shape = jax.eval_shape(build, rng)
        shardings = sh.state_sharding(state_shape, self.mesh)
        state = jax.jit(build, out_shardings=shardings)(rng)
        return state, shardings

    def _loss_fn(self, params, batch, rng, step, sample=True):
        if isinstance(self.model, TrajectoryModel):
            ms = self.mean_std
            if ms is None:
                # hard error (r3 verdict): training/validating a trajectory
                # model against zeros/ones stats silently produces wrong
                # de-standardisation semantics (trainer_trajectory_model.py
                # consumes the dataset stats); every CLI passes them —
                # direct Trainer users must too.
                raise ValueError(
                    "TrajectoryModel training requires the dataset mean/std: "
                    "pass mean_std=(2, 579) to Trainer (build_trainer wires "
                    "it automatically)")
            return trajectory_losses(self.model, params, batch, self.cfg, ms)
        return hmvae_forward(self.model, params, batch, rng, step, self.cfg,
                             sample=sample)

    def _build_steps(self):
        def train_step(state: TrainState, batch, rng):
            (_, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(state.params, batch, rng, state.step)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(params=new_params, opt_state=new_opt,
                              step=state.step + 1), metrics

        def eval_step(state: TrainState, batch, rng):
            _, metrics = self._loss_fn(state.params, batch, rng, state.step)
            return metrics

        def multi_step(state: TrainState, batches, rng):
            def body(st, xs):
                b, k = xs
                return train_step(st, b, jax.random.fold_in(rng, k))

            K = jax.tree.leaves(batches)[0].shape[0]
            state, ms = jax.lax.scan(
                body, state, (batches, jnp.arange(K)))
            return state, jax.tree.map(lambda m: m[-1], ms)

        bsh = sh.batch_sharding(self.mesh)
        multi_bsh = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, "data"))
        rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        self._step_fn = jax.jit(
            train_step,
            in_shardings=(self.shardings, bsh, rep),
            out_shardings=(self.shardings, rep),
            donate_argnums=(0,),
        )
        self._multi_fn = jax.jit(
            multi_step,
            in_shardings=(self.shardings, multi_bsh, rep),
            out_shardings=(self.shardings, rep),
            donate_argnums=(0,),
        )
        self._eval_fn = jax.jit(
            eval_step, in_shardings=(self.shardings, bsh, rep),
            out_shardings=rep,
        )
        # host->device ingest as an explicit jitted copy: produces genuinely
        # device-resident, compiler-laid-out arrays.  (Bare device_put /
        # passthrough-jit arrays stay host-staged behind the TPU tunnel and
        # are re-uploaded on EVERY executable launch — 50ms/call pathology.)
        # With transfer_dtype=float16 the wire format is f16 and the upcast
        # happens here (a real op, so the output is device-resident too).
        def ingest_leaf(x):
            if x.dtype == jnp.float32:
                return jnp.copy(x)
            return x.astype(jnp.float32)

        # random_root_rot as a fused device op inside the ingest jit: the
        # C++ loader ships compact UN-augmented windows and the per-batch
        # rotation happens on device (data/device_aug.py) — aug-enabled
        # configs keep the native wire path
        aug = None
        if self.cfg.data.random_root_rot_flag and self.cfg.data.device_augment:
            from ..data.device_aug import make_root_rot_augment

            aug = make_root_rot_augment(self.mean_std)
        self._aug_rng = jax.random.PRNGKey(self.cfg.run.seed + 91)

        if aug is None:
            self._ingest_multi = jax.jit(
                lambda t: jax.tree.map(ingest_leaf, t),
                out_shardings=multi_bsh)
            self._ingest_single = jax.jit(
                lambda t: jax.tree.map(ingest_leaf, t), out_shardings=bsh)
        else:
            def ingest_aug(t, key):
                return aug(jax.tree.map(ingest_leaf, t), key)

            self._ingest_multi = jax.jit(ingest_aug, out_shardings=multi_bsh)
            self._ingest_single = jax.jit(ingest_aug, out_shardings=bsh)
        self._augment = aug
        self._bsh_single, self._bsh_multi = bsh, multi_bsh
        self._wire_dtype = (np.float16 if self.cfg.data.transfer_dtype ==
                            "float16" else np.float32)

        def to_wire(t):
            if self._wire_dtype == np.float32:
                return t
            return jax.tree.map(lambda x: x.astype(self._wire_dtype), t)

        self._to_wire = to_wire

    def _to_global(self, t, multi: bool):
        """Multi-host: each process loaded only its local batch rows —
        assemble them into global jax.Arrays before the jitted ingest
        (host numpy into a pod-spanning jit is not addressable).
        Single-process this is the identity (the jit does the transfer)."""
        if jax.process_count() == 1:
            return t
        return mh.make_global_batch(
            t, self._bsh_multi if multi else self._bsh_single)

    # the aug stream is keyed by the TRAINING STEP at which the batch is
    # consumed (checkpointed state), not a process-local call counter: a
    # preempted-and-resumed run therefore replays the exact augmentation
    # stream of an uninterrupted one
    def _ingest_m(self, t, step: int):
        t = self._to_global(t, True)
        if self._augment is None:
            return self._ingest_multi(t)
        return self._ingest_multi(
            t, jax.random.fold_in(self._aug_rng, step))

    def _ingest_s(self, t, step: int):
        t = self._to_global(t, False)
        if self._augment is None:
            return self._ingest_single(t)
        return self._ingest_single(
            t, jax.random.fold_in(self._aug_rng, step))

    # ------------------------------------------------------------------
    # checkpointing
    def save(self, step: Optional[int] = None) -> str:
        assert ocp is not None, "orbax unavailable"
        step = int(self.state.step) if step is None else step
        path = os.path.join(os.path.abspath(self.ckpt_dir), f"gen_{step:08d}")
        # multi-host: EVERY process runs the device-side part (the snapshot
        # jit is a pod-wide SPMD launch — gating it to process 0 stalls its
        # collective context forever, observed as a Gloo DEADLINE_EXCEEDED
        # in the 2-process e2e test; skipping it would also desynchronise
        # the collective launch order across processes), but only process 0
        # performs the HOST write: state replicates over the data axis, so
        # its addressable shards are the complete state (shared-fs resume
        # assumption documented in docs/ARCHITECTURE.md).  State sharded
        # ACROSS hosts (model parallelism spanning processes) would need
        # orbax's multihost checkpointing — out of scope at this model's
        # size (the model axis fits inside one host's chips).
        if not self.cfg.run.async_checkpoint:
            if mh.is_primary():
                self._write_checkpoint(path, self.state)
            return path
        # async: the train loop's multi-step dispatch DONATES the state
        # buffers, so a background writer cannot hold references to
        # self.state — take a device-side copy first (one cheap dispatch,
        # non-donated outputs), then read back + write off-thread while the
        # next steps run.  The thread is NON-daemon: an interpreter exiting
        # right after a final save() waits for the write instead of killing
        # it mid-file (callers can also wait_for_saves() explicitly).
        import threading

        self.wait_for_saves()
        if self._snapshot_fn is None:
            self._snapshot_fn = jax.jit(
                lambda s: jax.tree.map(jnp.copy, s))
        snap = self._snapshot_fn(self.state)
        if not mh.is_primary():
            jax.block_until_ready(snap)  # keep launch cadence with process 0
            return path

        def write():
            try:
                self._write_checkpoint(path, snap)
            except BaseException as e:  # surfaced at the next join point
                self._save_error = e

        t = threading.Thread(target=write, daemon=False)
        self._save_thread = t
        t.start()
        return path

    @staticmethod
    def _primary_checkpointer():
        """StandardCheckpointer whose coordination set is {process 0}: in a
        multi-host run only process 0 calls save (the state is replicated),
        and orbax's default barriers would block on the processes that never
        joined (observed: Gloo DEADLINE_EXCEEDED in the 2-process e2e
        test)."""
        if jax.process_count() == 1:
            return ocp.StandardCheckpointer()
        mpo = ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0})
        return ocp.Checkpointer(
            ocp.StandardCheckpointHandler(multiprocessing_options=mpo),
            multiprocessing_options=mpo)

    @staticmethod
    def _to_host(state):
        """Device state -> host numpy WITHOUT collectives: np.asarray on a
        pod-spanning array goes through a process_allgather (a collective
        launch every process would have to join); a REPLICATED array's
        local shard already is the whole array."""
        def one(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                if not x.is_fully_replicated:
                    raise ValueError(
                        "checkpointing state sharded across hosts requires "
                        "orbax multihost checkpointing (all-process save); "
                        "this build writes from process 0 only and expects "
                        "replicated state")
                return np.asarray(x.addressable_data(0))
            return np.asarray(x)

        return jax.tree.map(one, state)

    def _write_checkpoint(self, path: str, state) -> None:
        ckptr = self._primary_checkpointer()
        ckptr.save(path, self._to_host(state), force=True)
        if hasattr(ckptr, "wait_until_finished"):  # sync Checkpointer lacks it
            ckptr.wait_until_finished()
        keep = self.cfg.run.keep_checkpoints
        if keep > 0:
            for stale in self._checkpoint_names()[:-keep]:
                import shutil

                shutil.rmtree(os.path.join(self.ckpt_dir, stale),
                              ignore_errors=True)

    def _checkpoint_names(self):
        """Finalized checkpoint dir names, sorted by step.  Excludes orbax's
        atomic-write staging dirs (gen_XXXXXXXX.orbax-checkpoint-tmp-<ts>) —
        an interrupted write must never be resumed from, counted toward
        retention, or shadow the newest finalized save."""
        import re

        if not os.path.isdir(self.ckpt_dir):
            return []
        return sorted(
            (d for d in os.listdir(self.ckpt_dir)
             if re.fullmatch(r"gen_\d{8,}", d)),
            key=lambda n: int(n[4:]))  # numeric: 9+ digit steps sort right

    def wait_for_saves(self) -> None:
        """Block until any in-flight async checkpoint write has finished and
        re-raise its error, if it failed.  save()/resume()/fit() call this
        internally; call it before relying on a just-saved path."""
        t = getattr(self, "_save_thread", None)
        if t is not None and t.is_alive():
            t.join()
        self._save_thread = None
        err = getattr(self, "_save_error", None)
        if err is not None:
            self._save_error = None
            raise RuntimeError("async checkpoint write failed") from err

    # back-compat alias (older tests/callers)
    def _join_pending_save(self) -> None:
        self.wait_for_saves()

    def latest_checkpoint(self) -> Optional[str]:
        cands = self._checkpoint_names()
        return os.path.join(os.path.abspath(self.ckpt_dir), cands[-1]) if cands else None

    def resume(self, path: Optional[str] = None) -> int:
        """Restore (params, opt_state, step); returns the restored step."""
        assert ocp is not None, "orbax unavailable"
        self._join_pending_save()   # an in-flight async save may be newest
        path = path or self.latest_checkpoint()
        if path is None:
            return 0
        path = os.path.abspath(path)  # orbax rejects relative paths
        # restore is SYMMETRIC in multi-host: every process reads the same
        # checkpoint from the shared fs (default orbax barriers are fine —
        # all processes participate), then places its local shards
        ckptr = ocp.StandardCheckpointer()
        target = self._to_host(self.state)
        # conv weight-layout detection (models/param_layout.py): a
        # checkpoint written under the other model.param_layout restores
        # against a converted target, then converts back — params AND Adam
        # moment/count trees, all function-exact, so dense<->compact runs
        # resume each other seamlessly
        from ..models.param_layout import convert_state, tree_has_key
        want = self.cfg.model.param_layout
        ck_layout = want
        try:
            meta = ocp.PyTreeCheckpointer().metadata(path).item_metadata
            ck_layout = ("compact" if tree_has_key(meta["params"], "weight_c")
                         else "dense")
        except Exception:
            pass  # no metadata (old orbax) -> assume matching layout
        if ck_layout != want:
            logging.getLogger(__name__).info(
                "resume: converting checkpoint conv layout %s -> %s",
                ck_layout, want)
            target = convert_state(target, self.cfg.model, ck_layout)
        try:
            restored = ckptr.restore(path, target)
        except FileNotFoundError:
            raise                    # a wrong path is not a layout problem
        except Exception as e:
            raise RuntimeError(
                f"strict (params+opt_state+step) restore failed for {path}"
                " — if the checkpoint was written under a different"
                " optimizer configuration (e.g. optim.none_grad_skip"
                " changed the opt-state layout), use load_params() for a"
                " params-only load, or resume with the matching optimizer"
                " settings") from e
        if ck_layout != want:
            restored = convert_state(restored, self.cfg.model, want)
        self.state = jax.device_put(restored, self.shardings)
        return int(self.state.step)

    def load_params(self, path: str) -> None:
        """Weights-only restore — the reference's exact load_ckpt semantics
        (``trainer_motion_vae.py:129-135``: load_state_dict only; optimizer
        state AND the iteration counter stay fresh, so ``--test_model`` +
        training warm-starts the schedule from 0).  Reads the checkpoint
        without a structure template, so checkpoints written under a
        different optimizer configuration (e.g. pre-``none_grad_skip``
        opt-state layouts) stay loadable for eval/inference."""
        assert ocp is not None, "orbax unavailable"
        self._join_pending_save()
        # partial restore: read ONLY the params subtree (placeholder leaves
        # carry structure, not values) — skipping the Adam moments halves the
        # checkpoint I/O on this host and tolerates any opt-state layout
        from ..models.param_layout import convert_conv_params, tree_has_key
        want = self.cfg.model.param_layout
        # conv weight-layout detection: the checkpoint may use the OTHER
        # param_layout (dense vs compact, models/param_layout.py) — the
        # conversion is function-exact both ways, so e.g. a dense-trained
        # gen_* checkpoint evaluates under a compact model config.  orbax's
        # partial_restore silently leaves missing leaves as placeholders, so
        # the layout must be read from the checkpoint METADATA up front.
        ck_layout = want
        try:
            meta = ocp.PyTreeCheckpointer().metadata(
                os.path.abspath(path)).item_metadata
            ck_layout = ("compact" if tree_has_key(meta["params"], "weight_c")
                         else "dense")
        except Exception:
            pass  # no metadata (old orbax) -> assume matching layout
        if ck_layout == want:
            skeleton = {"params": jax.tree.map(lambda _: 0, self.state.params)}
            raw = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(item=skeleton,
                                            partial_restore=True))
            params = raw["params"]
        else:
            shapes = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype),
                                  self.state.params)
            other_tree = convert_conv_params(shapes, self.cfg.model, ck_layout)
            raw = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(
                    item={"params": jax.tree.map(lambda _: 0, other_tree)},
                    partial_restore=True))
            logging.getLogger(__name__).info(
                "load_params: converting checkpoint conv layout %s -> %s",
                ck_layout, want)
            params = convert_conv_params(raw["params"], self.cfg.model, want)
        params = jax.device_put(params, self.shardings.params)
        self.state = self.state.replace(params=params)

    # ------------------------------------------------------------------
    def _save_visualizations(self, test_ds, step: int, rng) -> None:
        """GT vs mean-reconstruction vs prior-sample animations — the train
        loop's periodic viz (train_motion_vae.py:113-150 + model.test,
        seq_two_hier_sa_vae.py:560-639).

        Runs on process 0 only, so the inference jits must be PROCESS-LOCAL
        launches: multi-host, ``state.params`` are pod-spanning arrays and a
        jit closed over them is a pod-wide SPMD program that every process
        would have to join (the save()-comment deadlock).  ``host_local_copy``
        re-binds the helper on host numpy params — identity single-process."""
        from ..apps.inference import VAEInference
        from ..ops import fk as fk_mod
        from ..utils.viz import save_animation

        infer = VAEInference(self.model, mh.host_local_copy(self.state.params),
                             self.cfg)
        b = test_ds.sample_batch(1)
        _, _, mean_pose = infer.mean_reconstruction(jnp.asarray(b["rot_6d"]))
        _, _, samp_pose = infer.prior_samples(jax.random.fold_in(rng, step), 1)
        gt_pose = fk_mod.fk_numpy(np.asarray(b["rot_mat"][0]))
        dest = os.path.join(self.image_dir, str(step))
        save_animation(np.stack([gt_pose, np.asarray(mean_pose[0])]),
                       os.path.join(dest, "mean_seq_rot_6d.mp4"))
        save_animation(np.asarray(samp_pose[0])[None],
                       os.path.join(dest, "sampled_seq_rot_6d.mp4"))

    # ------------------------------------------------------------------
    def fit(
        self,
        train_ds: MotionDataset,
        val_ds: Optional[MotionDataset] = None,
        max_iter: Optional[int] = None,
        log_cb=None,
        test_ds: Optional[MotionDataset] = None,
    ) -> Dict[str, float]:
        cfg = self.cfg
        if self._step_fn is None:
            self._build_steps()
        max_iter = max_iter if max_iter is not None else cfg.optim.max_iter
        # optim.batch_size is GLOBAL at any scale (loss curves stay
        # comparable); multi-host, each process's loader draws its share and
        # _to_global stitches the shares into the pod-wide batch
        bs = cfg.optim.batch_size
        bs_local = mh.local_batch_size(bs)
        rng = jax.random.PRNGKey(cfg.run.seed + 17)

        K = max(1, cfg.run.steps_per_call)
        need_root_v = isinstance(self.model, TrajectoryModel)
        compact = (cfg.data.compact_transfer
                   and hasattr(train_ds, "iter_compact_superbatches"))
        native_super = K > 1 and (
            compact or hasattr(train_ds, "iter_superbatches"))
        wire = cfg.data.wire_format
        if native_super and compact:
            it = train_ds.iter_compact_superbatches(
                K, bs_local, need_root_v=need_root_v,
                threads=cfg.data.native_threads, wire=wire)
        elif native_super:
            it = train_ds.iter_superbatches(
                K, bs_local, threads=cfg.data.native_threads)
        elif compact:
            it = _compact_single_iter(train_ds, bs_local, need_root_v,
                                      cfg.data.native_threads, wire)
        else:
            it = PrefetchIterator(train_ds.iter_batches(bs_local),
                                  depth=cfg.data.num_prefetch)
        metrics = {}
        start = int(self.state.step)

        def _next_super():
            if native_super:
                return next(it)
            bs_list = [next(it) for _ in range(K)]
            return jax.tree.map(lambda *xs: np.stack(xs), *bs_list)

        # double-buffered ingest: the jitted copy for superbatch i+1 is issued
        # while step i computes (jax dispatch is async — _multi_fn returns as
        # soon as the step is enqueued, so the next host->device transfer
        # overlaps device compute instead of serialising after it).  This
        # hides the measured ~9 ms/14 MB relay transfer (BASELINE.md).
        pending = None
        nan_restored_from = -1
        # preemption safety (RunConfig.preemption_checkpoint): TPU-VM /
        # GCE preemption delivers SIGTERM with a short grace window; flag it
        # here and checkpoint-then-return at the next loop boundary.  Only
        # the main thread can install signal handlers — elsewhere (e.g. a
        # fit driven from a worker thread) the feature degrades to off.
        import signal as _signal
        self._preempted = False
        prev_handler, handler_installed = None, False
        if cfg.run.preemption_checkpoint:
            def _on_sigterm(signum, frame):
                self._preempted = True
            try:
                prev_handler = _signal.signal(_signal.SIGTERM, _on_sigterm)
                handler_installed = True
            except ValueError:   # not the main thread
                logging.getLogger(__name__).warning(
                    "preemption checkpointing disabled: fit() is not "
                    "running in the main thread, so the SIGTERM handler "
                    "cannot be installed (run.preemption_checkpoint "
                    "degrades to off)")
        try:
            i = start
            while i < max_iter:
                prev_i = i
                if self._preempted:
                    self.save(i)
                    self.wait_for_saves()
                    self.writer.write(i, {"preempt_checkpoint_step": i})
                    logging.getLogger(__name__).warning(
                        "SIGTERM received: checkpointed at step %d, "
                        "exiting fit cleanly (resume with --resume)", i)
                    break
                # host arrays go straight into the jit: a one-shot implicit
                # transfer per call (pre-device_put'ed arrays get re-staged
                # across the TPU relay on EVERY executable launch — measured
                # 50ms/call vs 1.4ms; see BASELINE.md)
                if K > 1 and i + K <= max_iter:
                    if pending is None:
                        pending = self._ingest_m(
                            self._to_wire(_next_super()), i)
                    cur, pending = pending, None
                    self.state, metrics = self._multi_fn(
                        self.state, cur, jax.random.fold_in(rng, i))
                    if i + 2 * K <= max_iter:
                        # prefetch the next superbatch onto the device while
                        # the step above runs; keyed by the step it will be
                        # consumed at (i + K)
                        pending = self._ingest_m(
                            self._to_wire(_next_super()), i + K)
                    i += K
                elif native_super:
                    # tail: fewer than K steps remain but the iterator yields
                    # (K, B, ...) superbatches — consume single rows
                    sb = next(it)
                    rem = max_iter - i
                    for j in range(rem):
                        row = jax.tree.map(lambda x: x[j], sb)
                        self.state, metrics = self._step_fn(
                            self.state,
                            self._ingest_s(self._to_wire(row), i),
                            jax.random.fold_in(rng, i))
                        i += 1
                else:
                    self.state, metrics = self._step_fn(
                        self.state,
                        self._ingest_s(self._to_wire(next(it)), i),
                        jax.random.fold_in(rng, i))
                    i += 1

                # cadences fire when the counter crosses a multiple of the
                # interval (a dispatch may cross it mid-call); the window is
                # the steps ACTUALLY advanced this iteration — using K when
                # the tail branch advanced fewer re-fired cadences for steps
                # already handled
                def crossed(interval):
                    return (i // interval) > (prev_i // interval)

                if crossed(cfg.run.log_iter):
                    host = {k: float(v) for k, v in metrics.items()}
                    if cfg.run.nan_guard and not np.isfinite(host["loss_total"]):
                        # failure detection + recovery: restore the last good
                        # snapshot instead of silently training on NaNs
                        # (the reference has no guard at all, SURVEY §5.3)
                        restored = self.resume()
                        self.writer.write(i, {"nan_guard_restored_to": restored})
                        if restored == 0:
                            raise FloatingPointError(
                                f"non-finite loss at step {i} and no "
                                "checkpoint to restore")
                        if restored == nan_restored_from:
                            # the latest checkpoint ITSELF produces NaNs
                            # (saved after the corruption): a second restore
                            # to the same step would loop forever — fail loud
                            raise FloatingPointError(
                                f"non-finite loss recurred after restoring "
                                f"to step {restored} — checkpoint is "
                                "corrupt; restore an earlier one manually")
                        nan_restored_from = restored
                        i = restored
                        continue
                    self.writer.write(i, host)
                    if log_cb:
                        log_cb(i, host)

                if val_ds is not None and crossed(cfg.run.validation_iter):
                    # deterministic ordered validation pass (<=50 batches,
                    # train_motion_vae.py:98-110): identical windows every
                    # pass and every run, so val curves are run-comparable.
                    # Multi-host: every process enumerates the SAME ordered
                    # batches (same seed) and contributes its contiguous row
                    # share — the global batch is identical to single-host
                    vals = []
                    v0, v1 = mh.process_shard(bs)
                    for vi, vb in enumerate(val_ds.ordered_batches(
                            bs, max_batches=50, seed=cfg.run.seed)):
                        if jax.process_count() > 1:
                            vb = jax.tree.map(lambda x: x[v0:v1], vb)
                            vb = self._to_global(vb, False)
                        vm = self._eval_fn(self.state, vb,
                                           jax.random.fold_in(rng, 10_000_000 + vi))
                        vals.append({k: float(v) for k, v in vm.items()})
                    if vals:  # val split smaller than one batch yields none
                        avg = {f"val_{k}": float(np.mean([v[k] for v in vals]))
                               for k in vals[0]}
                        self.writer.write(i, avg)

                if crossed(cfg.run.snapshot_save_iter):
                    self.save(i)

                if (test_ds is not None and mh.is_primary()
                        and not isinstance(self.model, TrajectoryModel)
                        and crossed(cfg.run.image_save_iter)):
                    self._save_visualizations(test_ds, i, rng)
        finally:
            if handler_installed:
                try:
                    _signal.signal(
                        _signal.SIGTERM,
                        prev_handler if prev_handler is not None
                        else _signal.SIG_DFL)
                except ValueError:
                    pass
            if hasattr(it, "close"):
                it.close()
            # capture BEFORE entering the except handler: inside the handler
            # sys.exc_info() is the RuntimeError being handled, never None,
            # which made the clean-exit re-raise unreachable (a failed async
            # save would be logged and swallowed)
            import sys

            propagating = sys.exc_info()[0] is not None
            try:
                self.wait_for_saves()
            except RuntimeError:
                if not propagating:
                    raise  # clean exit path: surface the failed save
                # an exception is already propagating — don't mask it
                logging.getLogger(__name__).exception(
                    "async checkpoint write failed during teardown")
        return {k: float(v) for k, v in metrics.items()}


def _compact_single_iter(ds, bs, need_root_v, threads, wire="rotmat"):
    while True:
        yield ds.sample_compact(bs, need_root_v, threads, wire=wire)


def build_trainer(cfg: Config, output_dir: str) -> tuple:
    """Construct (trainer, train_ds, val_ds, test_ds) with matching stats."""
    train_ds, val_ds, test_ds = make_loaders(cfg)
    ms = np.stack([train_ds.mean, train_ds.std])
    trainer = Trainer(cfg, output_dir, mean_std=ms)
    return trainer, train_ds, val_ds, test_ds
