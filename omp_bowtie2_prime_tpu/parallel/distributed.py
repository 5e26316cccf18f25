"""Multi-host scale-out: process initialization and deterministic read
sharding.

The reference is single-node; its cross-process story is shared-memory
index reuse (--mm/--shmem, mm.h/shmem.h:20-50) and its determinism
contract is the OutputQueue's input-order emission (outq.h:31-45). The
TPU-native multi-host design (SURVEY §2.4 / §5):

  - jax.distributed initializes the pod slice; the FM index is replicated
    per host (each host builds/loads its own copy into HBM);
  - the FASTQ stream is sharded per host by contiguous read-id blocks, so
    host h aligns reads [h*B, (h+1)*B) of each superbatch — pure data
    parallelism over DCN with no cross-host collectives;
  - per-read determinism (same alignment regardless of placement) makes
    the merge a trivial rdid-ordered concatenation of per-host SAM shards.
"""

from __future__ import annotations

import jax


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-host; returns
    (process_id, num_processes). Single-process if no coordinator given."""
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_shard(reads_iter, process_id: int, num_processes: int,
               block: int = 4096):
    """Deterministic per-host read sharding: contiguous blocks of `block`
    reads round-robin across hosts. Yields this host's reads; rdids are
    preserved so per-host SAM shards merge in input order."""
    buf = []
    blk_idx = 0
    for rd in reads_iter:
        buf.append(rd)
        if len(buf) == block:
            if blk_idx % num_processes == process_id:
                yield from buf
            buf = []
            blk_idx += 1
    if buf and blk_idx % num_processes == process_id:
        yield from buf


def merge_sam_shards(shard_paths: list[str], out_path: str,
                     block: int = 4096) -> None:
    """rdid-ordered merge of per-host SAM shards produced with host_shard
    (the OutputQueue reorder contract, outq.h:31-45): headers come from
    shard 0; record "read units" (consecutive records sharing a QNAME —
    mates and secondaries stay together) interleave block-round-robin,
    undoing host_shard's block assignment."""
    headers: list[str] = []
    units: list[list[list[str]]] = []  # per shard: list of read units
    for i, p in enumerate(shard_paths):
        shard_units: list[list[str]] = []
        prev_name = None
        with open(p) as f:
            for line in f:
                if line.startswith("@"):
                    if i == 0:
                        headers.append(line)
                    continue
                name = line.split("\t", 1)[0]
                if name != prev_name:
                    shard_units.append([])
                    prev_name = name
                shard_units[-1].append(line)
        units.append(shard_units)
    n = len(units)
    idxs = [0] * n
    with open(out_path, "w") as out:
        out.writelines(headers)
        b = 0
        while any(idxs[s] < len(units[s]) for s in range(n)):
            src = b % n
            take = units[src][idxs[src] : idxs[src] + block]
            for unit in take:
                out.writelines(unit)
            idxs[src] += block
            b += 1
