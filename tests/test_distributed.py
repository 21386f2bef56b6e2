"""Multi-device data parallelism on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soap3dp_tpu.distributed import mesh as dmesh
from soap3dp_tpu.fm.search import SearchConfig, search_reads


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return dmesh.make_mesh(jax.devices()[:8])


def test_sharded_search_matches_single_device(mesh8, small_index,
                                              small_device_index,
                                              small_genome, rng):
    codes = small_genome.codes
    B, L = 64, 40
    pos = rng.integers(0, len(codes) - L, B)
    reads = np.stack([codes[p:p + L] for p in pos]).astype(np.uint8)
    lens = np.full(B, L, np.int32)
    cfg = SearchConfig(k=1, occ_cap=8)

    # single-device reference result
    ref = search_reads(small_device_index, reads, lens, cfg)
    ref_row, ref_tp, ref_nm, ref_va, _ = ref.to_host()

    didx = dmesh.replicate_index(small_index, mesh8)
    sreads, slens, B0 = dmesh.shard_batch(mesh8, reads, lens)
    hits, n_aligned = dmesh.alignment_step(
        mesh8, didx, sreads, slens, cfg, max_steps=L // 2)
    row, tp, nm, va, _ = hits.to_host()
    assert n_aligned == B  # every read was sampled from the genome
    # same hit sets per read (rows: fwd 0..B-1 then rc)
    for r in range(2 * B):
        m = va & (row == r)
        got = set(zip(tp[m].tolist(), nm[m].tolist()))
        mr = ref_va & (ref_row == r)
        want = set(zip(ref_tp[mr].tolist(), ref_nm[mr].tolist()))
        assert got == want, r


def test_graft_entry_hooks():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(min(8, len(jax.devices())))


def _record_tuples(writer):
    return [(r.qname, r.flag, r.chrom, r.pos, r.mapq, r.cigar, r.mate_chrom,
             r.mate_pos, r.tlen, tuple(r.tags)) for r in writer.records]


def test_pair_pipeline_mesh_matches_single_device(mesh8):
    """The REAL pair pipeline (align_pair_batch phases A-E) on the
    8-device mesh must emit exactly the records of a single-device run
    (VERDICT round-1 item 1: multi-chip wired into the actual pipeline)."""
    import __graft_entry__ as g
    from soap3dp_tpu.distributed import mesh as dmesh
    from soap3dp_tpu.fm.fmindex import device_index
    from soap3dp_tpu.pipeline.pair import align_pair_batch

    index, b1, b2, opts = g.make_tiny_pair_workload(n_pairs=36, seed=5)

    w1 = g._CollectWriter()
    s1 = align_pair_batch(index, device_index(index), b1, b2, opts, w1)

    didx = dmesh.replicate_index(index, mesh8, shard_sa=True)
    w8 = g._CollectWriter()
    s8 = align_pair_batch(index, didx, b1, b2, opts, w8)

    assert (s1.paired_bwt, s1.paired_dp, s1.single_rescued, s1.unaligned,
            s1.num_records) == \
           (s8.paired_bwt, s8.paired_dp, s8.single_rescued, s8.unaligned,
            s8.num_records)
    assert _record_tuples(w1) == _record_tuples(w8)
    assert s1.paired_bwt > 0 and s1.paired_dp > 0


def test_sharded_sa_matches_replicated(mesh8, small_index, small_genome, rng):
    """SA table sharded across the mesh: same results, 1/n the SA
    memory per device (the 'index sharding' axis, SURVEY 2.3)."""
    codes = small_genome.codes
    B, L = 32, 40
    pos = rng.integers(0, len(codes) - L, B)
    reads = np.stack([codes[p:p + L] for p in pos]).astype(np.uint8)
    lens = np.full(B, L, np.int32)
    cfg = SearchConfig(k=1, occ_cap=8)

    d_rep = dmesh.replicate_index(small_index, mesh8)
    d_sh = dmesh.replicate_index(small_index, mesh8, shard_sa=True)
    # per-device SA bytes shrink by the mesh size
    shard_bytes = {db.data.nbytes for db in d_sh.sa_samples.addressable_shards}
    assert max(shard_bytes) <= d_rep.sa_samples.nbytes // 8 + 8

    sreads, slens, _ = dmesh.shard_batch(mesh8, reads, lens)
    h_rep, n_rep = dmesh.alignment_step(mesh8, d_rep, sreads, slens, cfg,
                                        max_steps=L // 2)
    h_sh, n_sh = dmesh.alignment_step(mesh8, d_sh, sreads, slens, cfg,
                                      max_steps=L // 2)
    assert n_rep == n_sh == B
    r1, t1, m1, v1, _ = h_rep.to_host()
    r2, t2, m2, v2, _ = h_sh.to_host()
    assert set(zip(r1[v1].tolist(), t1[v1].tolist(), m1[v1].tolist())) == \
        set(zip(r2[v2].tolist(), t2[v2].tolist(), m2[v2].tolist()))
