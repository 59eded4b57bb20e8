"""Optimizer / LR-schedule factories (optax).

Parity notes:
- torch ``Adam(weight_decay=wd)`` folds ``wd * p`` into the *gradient* (L2
  regularisation), unlike AdamW.  Equivalent optax chain:
  ``add_decayed_weights(wd) -> scale_by_adam -> scale_by_learning_rate``.
- ``StepLR(step_size, gamma)`` == lr * gamma^(step // step_size); ``MultiStepLR``
  uses milestone boundaries.  (``trainer_motion_vae.py:29-35, 251-262``.)
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import chex
import jax
import jax.numpy as jnp
import optax

from ..utils.config import OptimConfig


class ScaleByAdamState(NamedTuple):
    count: chex.Array
    mu: chex.PyTreeDef
    nu: chex.PyTreeDef


def _adam_math(g32, m, v, c1, c2, b1, b2, eps):
    """The bias-corrected Adam update expression shared by
    scale_by_adam_stored and torch_adam_l2 (f32 moments in, f32 out)."""
    m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
    v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
    u = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
    return u, m32, v32


def _unzip(out, n):
    """Split a pytree of n-tuples into n pytrees."""
    leaf = lambda t: isinstance(t, tuple)
    return tuple(jax.tree.map(lambda t, i=i: t[i], out, is_leaf=leaf)
                 for i in range(n))


def stochastic_round_bf16(x32: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Stochastically round f32 values to the bf16 grid, returned AS f32
    (every output value is exactly bf16-representable).

    Mechanism: add a uniform random 16-bit integer to the raw IEEE-754 bits
    and truncate the low 16 — the classic SR trick: the value rounds to the
    bf16 neighbour above with probability equal to the dropped fraction, so
    ``E[round(x)] == x`` and sub-ulp optimizer updates accumulate in
    expectation instead of vanishing to round-to-nearest.  Works for both
    signs (sign-magnitude bit layout: the carry walks the magnitude, never
    the sign) and across binade boundaries (mantissa carry rolls into the
    exponent, which IS rounding up to the next power of two).  Not
    inf/NaN-safe — parameters are finite by construction (nan_guard halts
    the run otherwise).
    """
    bits = jax.lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    r = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    bits = (bits + r) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _hash_bits16(shape, salt, count):
    """16 uniform bits per element from a murmur3-finalized counter hash.

    The SR write-back needs fresh low-quality uniformity per (element, step),
    fused into the Adam elementwise kernel.  threefry (jax.random.bits) costs
    >100 ops/element and measurably made the bf16-param step COMPUTE-bound
    (chip r5: 7.6k vs 8.0k seqs/s f32 — the RNG ate the halved-HBM win);
    this is 9 VPU ops/element.  Distinct streams per element (iota), per
    leaf (salt) and per step (count); murmur3's finalizer avalanches all
    input bits into the low 16 (unbiasedness is pinned by
    tests/test_train_step.py::test_stochastic_round_bf16_unbiased_and_on_grid).
    """
    n = 1
    for d in shape:
        n *= int(d)
    h = (jax.lax.iota(jnp.uint32, n)
         + jnp.uint32(salt) * jnp.uint32(0x9E3779B1)
         + count.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return (h & jnp.uint32(0xFFFF)).reshape(shape)


def stochastic_round_bf16_hash(x32: jnp.ndarray, salt: int,
                               count: jnp.ndarray) -> jnp.ndarray:
    """``stochastic_round_bf16`` with the cheap counter-hash bit source
    (same rounding mechanism; see that docstring for the SR bit trick)."""
    bits = jax.lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    r = _hash_bits16(x32.shape, salt, count)
    bits = (bits + r) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


class SRState(NamedTuple):
    count: chex.Array


def stochastic_round_updates(param_dtype: str = "bfloat16"):
    """Final chain element for training low-precision-stored parameters.

    Receives the finished update ``u`` (post-LR, post-weight-decay) and the
    current params ``p`` (stored at ``param_dtype``), computes the exact new
    value ``p32 + u32``, stochastically rounds it to the storage grid, and
    returns the f32 difference ``sr32 - p32``.  ``optax.apply_updates``
    computes ``(p + u)`` under dtype promotion (f32) — which reconstructs
    ``sr32`` EXACTLY (both terms are bf16-representable, so the f32
    arithmetic is exact) — then casts to ``p.dtype`` losslessly.  Net
    effect: the stored parameter becomes the stochastic rounding of the
    true f32 update, with no f32 master copy and no HBM traffic beyond the
    bf16 reads/writes.
    """
    if jnp.dtype(param_dtype) != jnp.bfloat16:
        raise ValueError("stochastic_round_updates supports bfloat16 only")

    def init(params):
        del params
        return SRState(jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("stochastic_round_updates needs params")
        count = state.count + 1
        leaves_u, treedef = jax.tree.flatten(updates)
        leaves_p = jax.tree.leaves(params)

        def one(i, u, p):
            p32 = p.astype(jnp.float32)
            sr = stochastic_round_bf16_hash(
                p32 + u.astype(jnp.float32), i + 1, count)
            return sr - p32

        out = [one(i, u, p)
               for i, (u, p) in enumerate(zip(leaves_u, leaves_p))]
        return jax.tree.unflatten(treedef, out), SRState(count)

    return optax.GradientTransformation(init, update)


def scale_by_adam_stored(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         moment_dtype: str = "float32"):
    """``optax.scale_by_adam`` with BOTH moments stored in ``moment_dtype``.

    At ``float32`` this matches ``optax.scale_by_adam`` exactly (same update
    expression and bias correction; verified by ``tests/test_train_step.py``).
    ``bfloat16`` halves the optimizer-state HBM traffic — the dominant cost of
    the bs-8 step (BASELINE.md) — computing the update in f32 from the
    rounded moments.
    """
    dt = jnp.dtype(moment_dtype)

    def init(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=dt), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=dt), params)
        return ScaleByAdamState(jnp.zeros((), jnp.int32), mu, nu)

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def one(g, m, v):
            u, m32, v32 = _adam_math(g.astype(jnp.float32), m, v, c1, c2,
                                     b1, b2, eps)
            # updates stay f32 even for low-precision grads: downstream LR
            # scaling / stochastic_round_updates consume full precision (a
            # no-op for f32 grads — bit-identical to optax.scale_by_adam)
            return u, m32.astype(dt), v32.astype(dt)

        out = jax.tree.map(one, updates, state.mu, state.nu)
        upd, mu, nu = _unzip(out, 3)
        return upd, ScaleByAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class TorchAdamL2State(NamedTuple):
    count: chex.Array      # global iteration (LR schedule; StepLR ticks every step)
    counts: chex.PyTreeDef  # per-leaf torch ``state['step']`` counters
    mu: chex.PyTreeDef
    nu: chex.PyTreeDef


def torch_adam_l2(cfg: OptimConfig) -> optax.GradientTransformation:
    """Adam + L2-in-gradient + StepLR with torch's per-parameter
    ``grad is None`` skip semantics, fused into one transformation.

    torch's ``Adam`` loop does ``if p.grad is None: continue`` — a parameter
    outside the autograd graph this step gets NO update: no weight decay, no
    moment update, and its ``state['step']`` (bias-correction counter) does
    not advance; state is only created when the first real gradient arrives.
    The reference depends on this: below the KL-curriculum boundary the
    shallow + middle latent heads are fully detached
    (``seq_two_hier_sa_vae.py:381-388``, heads listed in PARITY.md), so they
    stay frozen at their init values until iteration 50k and re-enter
    training with FRESH bias correction.  A plain
    ``add_decayed_weights -> scale_by_adam`` chain instead sees exact-zero
    gradients, decays those heads to zero over ~10k steps, and (measured)
    caps how deeply the model can fit.

    Functional equivalent: a leaf whose gradient tensor is identically zero
    is "untouched" this step — updates, moments and its per-leaf count are
    all carried through unchanged.  (Exact-zero is the jit-traceable proxy
    for torch's ``None``: a parameter genuinely in the graph essentially
    never has an all-zero f32 gradient, and the detached heads always do.)
    Known divergence corner of the proxy: a parameter that IS in the graph
    but receives an exactly-zero gradient tensor (e.g. a head consumed only
    by a loss term whose config weight is 0.0 yet still computed into the
    graph) would be decayed by torch but frozen here.  No reference config
    can hit this — the reference hard-zeroes disabled loss terms instead of
    weighting live ones (``seq_two_hier_sa_vae.py:398-407``), so such heads
    are grad-None (skipped) in torch too.
    With every leaf touched this reduces bit-for-bit to the plain chain
    (same update expression, counts all equal the global count) — covered by
    the torch-chain equivalence tests.  ``moment_dtype`` storage matches
    :func:`scale_by_adam_stored`.
    """
    b1, b2, eps = 0.9, 0.999, 1e-8
    wd = float(cfg.weight_decay or 0.0)
    dt = jnp.dtype(cfg.moment_dtype)
    # param_dtype=bfloat16: params live in bf16 (halving fwd/bwd weight reads
    # and grad traffic); the Adam math stays f32 and the new value is written
    # back via stochastic rounding (see stochastic_round_bf16 — an f32 master
    # would cost the 2P read+write this mode exists to shed)
    param_sr = jnp.dtype(cfg.param_dtype) == jnp.bfloat16
    if not param_sr and jnp.dtype(cfg.param_dtype) != jnp.float32:
        raise ValueError(
            f"unsupported param_dtype: {cfg.param_dtype!r} "
            "(expected float32 | bfloat16)")
    sched = make_schedule(cfg)

    def init(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=dt), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=dt), params)
        counts = jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params)
        return TorchAdamL2State(jnp.zeros((), jnp.int32), counts, mu, nu)

    def update(grads, state, params):
        if params is None:
            raise ValueError("torch_adam_l2 needs params (L2 + skip mask)")
        gcount = state.count + 1
        lr = sched(state.count)

        def one(g, p, m, v, c, salt):
            touched = jnp.any(g != 0)
            g32 = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if wd:
                g32 = g32 + wd * p32
            cn = c + touched.astype(jnp.int32)
            # untouched leaves keep cn == c (possibly 0); clamp so the
            # discarded branch of the where() below can't divide by zero
            cf = jnp.maximum(cn, 1).astype(jnp.float32)
            u, m32, v32 = _adam_math(g32, m, v, 1 - b1 ** cf, 1 - b2 ** cf,
                                     b1, b2, eps)
            u = -lr * u
            if param_sr:
                # f32 update delta whose application under apply_updates'
                # promote-then-cast lands exactly on the stochastically
                # rounded bf16 value (see stochastic_round_updates); the
                # counter-hash bit source keeps the step HBM-bound (threefry
                # measurably made it compute-bound — _hash_bits16)
                u = stochastic_round_bf16_hash(p32 + u, salt, gcount) - p32
            else:
                u = u.astype(p.dtype)
            zero = jnp.zeros_like(u)
            return (jnp.where(touched, u, zero),
                    jnp.where(touched, m32, m.astype(jnp.float32)).astype(dt),
                    jnp.where(touched, v32, v.astype(jnp.float32)).astype(dt),
                    cn)

        if param_sr:
            leaves_g, treedef = jax.tree.flatten(grads)
            zipped = zip(leaves_g, jax.tree.leaves(params),
                         jax.tree.leaves(state.mu), jax.tree.leaves(state.nu),
                         jax.tree.leaves(state.counts))
            out = jax.tree.unflatten(
                treedef, [one(g, p, m, v, c, i + 1)
                          for i, (g, p, m, v, c) in enumerate(zipped)])
        else:
            out = jax.tree.map(
                lambda g, p, m, v, c: one(g, p, m, v, c, None),
                grads, params, state.mu, state.nu, state.counts)
        upd, mu, nu, counts = _unzip(out, 4)
        return upd, TorchAdamL2State(gcount, counts, mu, nu)

    return optax.GradientTransformation(init, update)


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    return make_schedule_raw(cfg.lr, cfg.lr_policy, cfg.step_size, cfg.gamma)


def make_schedule_raw(lr: float, policy: str, step_size, gamma: float) -> optax.Schedule:
    if policy == "constant" or not policy:
        return optax.constant_schedule(lr)
    if policy == "step":
        return lambda step: lr * gamma ** (step // int(step_size))
    if policy == "mstep":
        milestones: Sequence[int] = tuple(step_size)
        boundaries = {int(m): gamma for m in milestones}
        return optax.piecewise_constant_schedule(lr, boundaries)
    raise ValueError(f"unknown lr_policy: {policy}")


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if cfg.none_grad_skip:
        return torch_adam_l2(cfg)
    if jnp.dtype(cfg.param_dtype) != jnp.float32:
        # the SR write-back lives in the fused torch-semantics optimizer;
        # the plain chain would silently lose sub-ulp updates to the
        # apply_updates round-to-nearest cast
        raise ValueError(
            "param_dtype=bfloat16 requires none_grad_skip=True")
    parts = []
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(scale_by_adam_stored(b1=0.9, b2=0.999, eps=1e-8,
                                      moment_dtype=cfg.moment_dtype))
    parts.append(optax.scale_by_learning_rate(make_schedule(cfg)))
    return optax.chain(*parts)


def make_latent_optimizer(lr: float, policy: str, step_size, gamma: float,
                          weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam for test-time latent optimization (Adam(z, lr=opt_lr) with StepLR,
    seq_two_hier_sa_vae.py:1162-1163)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(
        make_schedule_raw(lr, policy, step_size, gamma)))
    return optax.chain(*parts)
