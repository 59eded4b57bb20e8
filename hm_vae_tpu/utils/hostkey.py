"""Stable-but-discriminating host key for CPU compile-cache directories.

XLA:CPU AOT results compiled on a different machine type still LOAD (with an
error log about unsupported target features) but can execute with silently
wrong numerics — observed here as a train-descent test failing only under a
stale /tmp cache after the container migrated hosts.  Cache dirs must
therefore be keyed by the host's CPU identity:

- the ``flags`` line alone is NOT discriminating enough: XLA also bakes
  model-derived pseudo-features (``+prefer-no-scatter``/``-gather`` on some
  Xeons) into its AOT results, so two hosts with identical flags can still
  produce mutually-poisonous caches;
- hashing all of ``/proc/cpuinfo`` is too volatile: ``cpu MHz``/``bogomips``
  change between boots of the SAME host, so the cache never hits.

``model name + stepping + flags`` of the first processor block is both
stable across boots and distinct across machine types.
"""

from __future__ import annotations

import hashlib


def cpu_cache_key() -> str:
    """12-hex-char key identifying this host's CPU for cache-dir naming."""
    try:
        ident = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "stepping", "flags")):
                    ident.append(line)
                if line.strip() == "" and ident:
                    break  # first processor block only
        if not ident:
            return "generic"
        return hashlib.sha1("".join(ident).encode()).hexdigest()[:12]
    except OSError:
        return "generic"
