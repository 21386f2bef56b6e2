"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_multihost.py): the per-host shard + merge recipe from
docs/SCALING.md on a 2-process CPU "cluster".

Each process owns half the read batch (as each host reads its own
FASTQ shard in production), aligns it on its LOCAL devices, and the
aligned-read counts are combined with a cross-process psum over the
global mesh — the DCN-analog collective.
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from soap3dp_tpu.distributed import mesh as dmesh
    from soap3dp_tpu.fm import fmindex
    from soap3dp_tpu.fm.search import SearchConfig, _search_batch
    from soap3dp_tpu.index.builder import build_index
    from soap3dp_tpu.index.packing import PackedGenome
    from soap3dp_tpu.utils import dna

    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

    # same tiny index on every host (the production recipe loads the
    # same index artifact per host)
    rng = np.random.default_rng(0)
    gbp = 50_000
    codes = rng.integers(0, 4, gbp).astype(np.uint8)
    genome = PackedGenome(
        codes=codes, pac=dna.pack_codes(codes), length=gbp,
        names=["chrT"], offsets=np.asarray([0, gbp], np.uint64),
        amb_starts=np.zeros(0, np.uint64), amb_lengths=np.zeros(0, np.uint64))
    index = build_index(genome, sa_rate=8, lut_k=8)

    # each process aligns ITS shard on its local devices only
    B_local, L = 16, 48
    pos = np.arange(B_local) * 97 + pid * 1559
    reads = np.stack([codes[p:p + L] for p in pos]).astype(np.uint8)
    lens = np.full(B_local, L, np.int32)
    lmesh = dmesh.make_mesh(jax.local_devices())
    didx = dmesh.replicate_index(index, lmesh)
    sreads, slens, _ = dmesh.shard_batch(lmesh, reads, lens)
    cfg = SearchConfig(k=1, occ_cap=8)
    hits, _ = _search_batch(didx, sreads, slens, cfg, cfg.occ_cap, L // 2)
    row, tp, nm, va, _ = hits.to_host()
    fwd = va & (row < B_local)
    got = dict(zip(row[fwd].tolist(), tp[fwd].tolist()))
    for b, p in enumerate(pos):
        assert got.get(b) == p, (pid, b, got.get(b), p)

    # cross-process merge: psum the per-host aligned counts over the
    # GLOBAL 2-host mesh (the DCN collective of docs/SCALING.md)
    gmesh = dmesh.make_mesh(jax.devices(), axis="hosts")
    n_aligned_local = int(len(set(row[fwd].tolist())))
    sh = NamedSharding(gmesh, P("hosts"))
    per_dev = np.zeros(len(jax.devices()), np.int32)
    per_dev[pid * 2] = n_aligned_local  # one count per host, on its dev 0
    arr = jax.make_array_from_process_local_data(sh, per_dev[
        pid * 2: pid * 2 + 2])

    total = jax.jit(jnp.sum, out_shardings=NamedSharding(gmesh, P()))(arr)
    total = int(total)
    assert total == nproc * B_local, total
    print(f"[multihost:{pid}] ok: local {n_aligned_local}, global {total}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
