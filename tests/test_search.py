"""Seed-and-verify k-mismatch search vs a brute-force oracle.

The oracle enumerates every (position, strand) placement with <= k
mismatches by sliding-window Hamming distance — the ground truth the
reference validated against its CPU implementation (BGS-TestNote.log).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.lib.stride_tricks import sliding_window_view

from soap3dp_tpu.fm import fmindex
from soap3dp_tpu.fm.search import HitArrays, SearchConfig, search_reads
from soap3dp_tpu.utils import dna


def brute_hits(codes: np.ndarray, read: np.ndarray, k: int):
    """{(strand, pos): nmis} for all placements with <= k mismatches."""
    out = {}
    for strand, seq in ((0, read), (1, dna.revcomp_codes(read))):
        L = len(seq)
        if L > len(codes):
            continue
        win = sliding_window_view(codes, L)
        nm = (win != seq[None, :]).sum(axis=1)
        for p in np.flatnonzero(nm <= k):
            out[(strand, int(p))] = int(nm[p])
    return out


def hits_to_dict(hits: HitArrays, b: int, B: int):
    """Device hit arrays -> {(strand, pos): nmis} for read b."""
    rows, tp, nm, va, _ = hits.to_host()
    out = {}
    for strand, row in ((0, b), (1, B + b)):
        m = va & (rows == row)
        for tpv, nmv in zip(tp[m], nm[m]):
            out[(strand, int(tpv))] = int(nmv)
    return out


def make_reads(rng, codes, B, L, k):
    """Reads sampled from the genome with planted mismatches, both strands."""
    n = len(codes)
    pos = rng.integers(0, n - L, size=B)
    reads = np.stack([codes[p:p + L] for p in pos]).astype(np.uint8)
    for i in range(B):
        nmut = rng.integers(0, k + 1)
        mp = rng.choice(L, size=nmut, replace=False)
        reads[i, mp] = (reads[i, mp] + rng.integers(1, 4, size=nmut)) % 4
    # half become reverse-complement samples
    for i in range(B // 2):
        reads[i] = dna.revcomp_codes(reads[i])
    return reads


@pytest.mark.parametrize("k", [0, 1, 2, 3, 4])
def test_all_valid_matches_bruteforce(small_device_index, small_genome, rng, k):
    codes = small_genome.codes
    B, L = 24, 36
    reads = make_reads(rng, codes, B, L, k)
    cfg = SearchConfig(k=k, occ_cap=16)
    hits = search_reads(small_device_index, reads, np.full(B, L), cfg)
    flagged = np.asarray(hits.flagged)
    for b in range(B):
        if flagged[b]:
            continue  # over budget even in round 2: completeness not promised
        expect = brute_hits(codes, reads[b], k)
        got = hits_to_dict(hits, b, B)
        assert got == expect, f"read {b}"


def test_round2_budget_recovers_repetitive_seeds(rng):
    """A genome with a heavy repeat forces round 2; hits must still be exact."""
    from tests.conftest import make_genome
    from soap3dp_tpu.index.builder import build_index
    from soap3dp_tpu.fm.fmindex import device_index

    unit = rng.integers(0, 4, size=25).astype(np.uint8)
    codes = np.concatenate([np.tile(unit, 40), rng.integers(0, 4, size=3000).astype(np.uint8)])
    g = _genome_from_codes(codes)
    idx = build_index(g, sa_rate=4, lut_k=4)
    didx = device_index(idx)

    # a read from inside the repeat: every seed has ~40 occurrences
    read = codes[3:53].copy()
    cfg = SearchConfig(k=1, occ_cap=8, occ_cap_round2=128)
    hits = search_reads(didx, read[None, :], np.array([50]), cfg)
    assert not np.asarray(hits.flagged)[0]
    expect = brute_hits(codes, read, 1)
    got = hits_to_dict(hits, 0, 1)
    assert got == expect


def test_variable_length_batch(small_device_index, small_genome, rng):
    codes = small_genome.codes
    L = 48
    lens = np.array([48, 37, 25, 41])
    reads = np.zeros((4, L), dtype=np.uint8)
    pos = rng.integers(0, len(codes) - L, size=4)
    for i, (p, ln) in enumerate(zip(pos, lens)):
        reads[i, :ln] = codes[p:p + ln]
    cfg = SearchConfig(k=1, occ_cap=16)
    hits = search_reads(small_device_index, reads, lens, cfg)
    for b in range(4):
        expect = brute_hits(codes, reads[b, :lens[b]], 1)
        got = hits_to_dict(hits, b, 4)
        assert got == expect, b


def test_full_sa_fast_path_matches_sampled(small_genome, rng):
    """sa_rate=1 (one-gather SA decode) must agree with the sampled walk."""
    from soap3dp_tpu.index.builder import build_index
    from soap3dp_tpu.fm.fmindex import device_index

    idx1 = build_index(small_genome, sa_rate=1)
    d1 = device_index(idx1)
    codes = small_genome.codes
    B, L = 16, 40
    reads = make_reads(rng, codes, B, L, 2)
    cfg = SearchConfig(k=2, occ_cap=16)
    h1 = search_reads(d1, reads, np.full(B, L), cfg)
    for b in range(B):
        expect = brute_hits(codes, reads[b], 2)
        assert hits_to_dict(h1, b, B) == expect, b


def _genome_from_codes(codes: np.ndarray):
    from soap3dp_tpu.index.packing import PackedGenome
    return PackedGenome(
        codes=codes,
        pac=dna.pack_codes(codes),
        length=len(codes),
        names=["chrT"],
        offsets=np.asarray([0, len(codes)], dtype=np.uint64),
        amb_starts=np.zeros(0, np.uint64),
        amb_lengths=np.zeros(0, np.uint64),
    )
