"""Data-parallel sharding over a device mesh.

The reference's parallelism is OpenMP data-parallel over a resident read
batch (bt2_search.cpp:2302-2304, SURVEY §2.4). The TPU-native mapping:
every device phase (seed search, SA walk, DP) is embarrassingly parallel
over its leading batch axis, so the whole align step shards over a 1-D
'data' mesh with the FM index replicated per device; XLA inserts no
collectives (pure SPMD data parallelism over ICI-connected chips).

Multi-host: each host feeds its own FASTQ shard (deterministic merge by
read id — the analog of the reference's OutputQueue reorder contract,
outq.h:31-45).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_batch_fn(fn, mesh: Mesh, static_argnums=()):
    """Wrap a device phase fn(idx, *batch_args) so the batch args shard
    over the 'data' axis and the index pytree replicates."""
    batched = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    jf = jax.jit(fn, static_argnums=static_argnums)

    def wrapper(idx, *args):
        idx_s = jax.tree.map(lambda a: jax.device_put(a, repl), idx)
        placed = []
        for a in args:
            if hasattr(a, "ndim") and a.ndim >= 1:
                placed.append(jax.device_put(a, batched))
            else:
                placed.append(a)
        return jf(idx_s, *placed)

    return wrapper


def full_align_step(idx, seeds, seed_valid, rows, row_valid,
                    reads, pens, rdlens, refs, wlens, swp):
    """One fused device step over all three phases (compile/shard target
    for the multi-chip dry run; the host pipeline calls the phases
    separately because their batch sizes differ)."""
    from ..ops.seed_search import search_seeds
    from ..ops.walk import resolve_rows
    from ..ops.sw import sw_e2e_batch

    top, bot = search_seeds(idx, seeds, seed_valid)
    offs = resolve_rows(idx, rows, row_valid)
    best, bestcol, _ = sw_e2e_batch(reads, pens, rdlens, refs, wlens, swp)
    return top, bot, offs, best, bestcol
