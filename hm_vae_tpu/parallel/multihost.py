"""Multi-host (pod-scale) process plumbing.

JAX's multi-host model: one Python process per host, each addressing only
its local chips; ``jax.distributed.initialize()`` wires the processes into
one runtime, after which ``jax.devices()`` is GLOBAL and the existing GSPMD
shardings (``parallel/sharding.py``) span the pod with no further changes —
the mesh axes just get bigger.  What does NOT scale automatically is the
host side, and that is what this module centralises:

- :func:`maybe_initialize_distributed` — env-gated
  ``jax.distributed.initialize`` (must run before any backend use);
- :func:`process_seed` — disjoint per-process random sampling streams for
  the train loaders;
- :func:`process_shard` — deterministic balanced shard of an ordered index
  space (eval splits, file lists);
- :func:`local_batch_size` — each process loads ``global / process_count``;
- :func:`is_primary` — process-0 gate for filesystem writes (checkpoints,
  metrics, animations);
- :func:`make_global_batch` — assemble per-process local arrays into one
  global ``jax.Array`` (``jax.make_array_from_process_local_data``).

Everything degrades to the identity in a single process, so the whole
module is exercised by the regular test suite; the reference has no
multi-host story at all (its only distribution is single-process
``DataParallel``, ``train_motion_vae.py:49-53``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

_TRUTHY = ("1", "true", "yes", "on")


def maybe_initialize_distributed() -> bool:
    """Env-gated ``jax.distributed.initialize()``.

    Gated on ``HMVAE_DIST`` (truthy) so single-host runs never pay the
    coordinator handshake.  With the gate set, initialization parameters
    come from the standard JAX environment (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or, on TPU pods, from the
    TPU metadata server — ``initialize()`` resolves them itself.

    Must be called BEFORE the first backend touch (the CLIs call it from
    ``apply_platform_env``).  Returns True when distributed mode is active
    (including when it was already initialized), False when gated off.
    """
    if os.environ.get("HMVAE_DIST", "").lower() not in _TRUTHY:
        return False
    import jax

    # explicit env triple beats auto-detection: it also works for ad-hoc
    # clusters (e.g. N CPU processes on one machine — how
    # tests/test_multihost.py drives the real two-process path)
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # double-init raises; treat "already initialized" as success
        if "already" not in str(e).lower():
            raise
    logging.getLogger(__name__).info(
        "jax.distributed initialized: process %d / %d",
        jax.process_index(), jax.process_count())
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns filesystem writes (checkpoints,
    metric logs, animations).  Always True single-process."""
    return process_index() == 0


def process_seed(base_seed: int, index: Optional[int] = None,
                 count: Optional[int] = None) -> int:
    """Per-process sampling seed: disjoint streams for iid window sampling.

    The train sampler draws windows iid, so data parallelism across hosts
    only needs DIFFERENT streams, not an explicit partition; offsetting by
    a large prime keeps the per-process numpy Generators uncorrelated.
    Identity for process 0 / single process, so single-host runs (and every
    existing checkpoint/parity artifact) are unaffected.  ``count`` (like
    :func:`process_shard`'s) only validates ``index``; the stream does not
    depend on world size.
    """
    i = process_index() if index is None else index
    c = process_count() if count is None else count
    if not 0 <= i < c:
        raise ValueError(f"process index {i} outside [0, {c})")
    return base_seed + 7_919_003 * i


def process_shard(n_items: int, index: Optional[int] = None,
                  count: Optional[int] = None) -> Tuple[int, int]:
    """Balanced contiguous [start, stop) shard of an ordered index space.

    For ordered work (eval splits, file lists) every process takes a
    deterministic contiguous slice; the first ``n_items % count`` processes
    take one extra item, covering all items with max imbalance 1.
    Identity (0, n_items) single-process.
    """
    i = process_index() if index is None else index
    c = process_count() if count is None else count
    if not 0 <= i < c:
        raise ValueError(f"process index {i} outside [0, {c})")
    base, extra = divmod(n_items, c)
    start = i * base + min(i, extra)
    stop = start + base + (1 if i < extra else 0)
    return start, stop


def local_batch_size(global_batch: int, index: Optional[int] = None,
                     count: Optional[int] = None) -> int:
    """Per-process batch: the config's ``optim.batch_size`` stays GLOBAL
    (semantics identical at any scale); each process loads its share.
    Requires divisibility — silent remainder-dropping would change the
    effective batch and make loss curves scale-dependent."""
    c = process_count() if count is None else count
    if global_batch % c != 0:
        raise ValueError(
            f"optim.batch_size={global_batch} must divide by the "
            f"{c} processes (each host loads batch/processes samples)")
    return global_batch // c


def host_local_copy(tree):
    """Pod-spanning REPLICATED arrays -> host numpy; identity single-process.

    For primary-only side work (periodic visualizations, per-sequence
    artifact writes) the compute must NOT launch over the pod mesh: a jit
    whose closure holds pod-spanning params is an SPMD program every process
    must join, and dispatching it from process 0 alone desynchronises the
    collective launch order (observed as a Gloo DEADLINE_EXCEEDED — see
    ``Trainer.save``'s comment).  Re-binding the helper on a host-numpy copy
    of the params makes every launch process-local, so one process can run
    it freely.  State actually sharded ACROSS hosts has no local copy —
    that raises, same contract as ``Trainer._to_host``.
    """
    import jax
    import numpy as np

    if process_count() == 1:
        return tree

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if not x.is_fully_replicated:
                raise ValueError(
                    "host_local_copy needs replicated (or addressable) "
                    "arrays; state sharded across hosts has no local copy")
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree.map(one, tree)


def make_global_batch(local_tree, sharding):
    """Assemble per-process LOCAL host arrays into global ``jax.Array``s.

    ``sharding`` is the global batch sharding (e.g. ``P("data")`` over the
    pod mesh); each process passes the rows it loaded and
    ``jax.make_array_from_process_local_data`` stitches the single-device
    views into one addressable-by-parts global array.  Single-process this
    is just a (sharded) ``device_put``.
    """
    import jax
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_tree)
