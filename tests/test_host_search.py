"""Host complete re-alignment tests (ProcessReadDoubleStrand2 analog).

Super-repetitive reads whose seeds exceed every device round's SA
budget must end with their COMPLETE placement set (reference guarantee,
CPUfunctions.cpp:555), not a truncated one.
"""

import numpy as np
import pytest

from soap3dp_tpu.fm import fmindex, host_search
from soap3dp_tpu.fm.search import SearchConfig, search_reads
from soap3dp_tpu.index.builder import build_index
from soap3dp_tpu.utils import dna
from tests.conftest import make_genome
from tests.test_search import brute_hits


def test_complete_search_matches_oracle(rng):
    genome = make_genome(rng, 30_000)
    index = build_index(genome, sa_rate=4, lut_k=6)
    codes = genome.codes
    for trial in range(6):
        p = int(rng.integers(0, 29_000))
        read = codes[p:p + 60].copy()
        if trial % 2:
            read = dna.revcomp_codes(read)
        if trial >= 2:  # plant mismatches
            for _ in range(trial // 2):
                q = int(rng.integers(0, 60))
                read[q] = (read[q] + 1) % 4
        k = 2
        strand, tp, nm, over = host_search.complete_search(
            index, read, 60, k)
        assert not over
        got = {(int(s), int(t)): int(m) for s, t, m in zip(strand, tp, nm)}
        assert got == brute_hits(codes, read, k)


def test_decode_rows_matches_device(rng):
    genome = make_genome(rng, 8_000)
    index = build_index(genome, sa_rate=8, lut_k=5)
    didx = fmindex.device_index(index)
    rows = rng.integers(0, index.num_rows, 500).astype(np.uint32)
    host = host_search.decode_rows(index, rows)
    dev = np.asarray(fmindex.sa_decode(didx, rows, np.ones(500, bool)))
    assert np.array_equal(host, dev)


@pytest.fixture()
def repeat_genome(rng):
    """A genome dominated by a tandem repeat: every pigeonhole segment
    of a read drawn from it occurs ~n_copies times, far past the
    round-3 budget (occ_cap_round3 = 4096)."""
    from soap3dp_tpu.index.packing import PackedGenome

    unit = rng.integers(0, 4, 60).astype(np.uint8)
    codes = np.concatenate(
        [rng.integers(0, 4, 2_000).astype(np.uint8),
         np.tile(unit, 6_000),
         rng.integers(0, 4, 2_000).astype(np.uint8)])
    g = PackedGenome(codes=codes, pac=dna.pack_codes(codes),
                     length=len(codes), names=["rep1"],
                     offsets=np.asarray([0, len(codes)], np.uint64),
                     amb_starts=np.zeros(0, np.uint64),
                     amb_lengths=np.zeros(0, np.uint64))
    return g, unit


def test_super_repetitive_read_gets_complete_set(repeat_genome, rng):
    genome, unit = repeat_genome
    index = build_index(genome, sa_rate=4, lut_k=6)
    didx = fmindex.device_index(index)
    read = np.tile(unit, 2)[:100]          # aligns at every unit start
    cfg = SearchConfig(k=2)
    hits = search_reads(didx, read[None, :].copy(),
                        np.asarray([100], np.int32), cfg)
    # the device rounds must have given up on this read
    assert np.asarray(hits.flagged).any()
    expect = brute_hits(genome.codes, read, 2)
    assert len(expect) > SearchConfig.occ_cap_round3

    fixed = host_search.realign_flagged(
        index, hits, read[None, :], np.asarray([100], np.int32), 2)
    assert not np.asarray(fixed.flagged).any()
    row, tp, nm, va, _ = fixed.to_host()
    got = {}
    for r, t, m, v in zip(row, tp, nm, va):
        if v:
            got[(int(r >= 1), int(t))] = int(m)
    assert got == expect


def test_realign_preserves_other_reads(repeat_genome, rng):
    """Unflagged reads' hits survive the re-align merge untouched."""
    genome, unit = repeat_genome
    codes = genome.codes
    index = build_index(genome, sa_rate=4, lut_k=6)
    didx = fmindex.device_index(index)
    normal = codes[500:600].copy()          # unique flank placement
    rep = np.tile(unit, 2)[:100]
    batch = np.stack([normal, rep])
    lens = np.full(2, 100, np.int32)
    hits = search_reads(didx, batch, lens, SearchConfig(k=2))
    fl = np.asarray(hits.flagged)
    assert not fl[0] and fl[1]
    before = {}
    row, tp, nm, va, _ = hits.to_host()
    for r, t, m, v in zip(row, tp, nm, va):
        if v and (r % 2 if False else (r == 0 or r == 2)):
            before[(int(r), int(t))] = int(m)

    fixed = host_search.realign_flagged(index, hits, batch, lens, 2)
    row, tp, nm, va, _ = fixed.to_host()
    after = {}
    for r, t, m, v in zip(row, tp, nm, va):
        if v and (r == 0 or r == 2):
            after[(int(r), int(t))] = int(m)
    assert after == before
    assert not np.asarray(fixed.flagged).any()


def test_overflow_guard_keeps_flag(repeat_genome):
    genome, unit = repeat_genome
    index = build_index(genome, sa_rate=4, lut_k=6)
    read = np.tile(unit, 2)[:100]
    strand, tp, nm, over = host_search.complete_search(
        index, read, 100, 2, max_interval=100)
    assert over


def test_single_pipeline_x0_reflects_complete_set(repeat_genome, rng):
    """End-to-end: a super-repetitive read aligned through the single
    pipeline reports the complete best-hit count (X0), and the run no
    longer counts it as still_flagged."""
    from soap3dp_tpu.fm.fmindex import device_index
    from soap3dp_tpu.io.fastq import ReadBatch
    from soap3dp_tpu.pipeline.options import AlignOptions
    from soap3dp_tpu.pipeline.single import align_single_batch

    genome, unit = repeat_genome
    index = build_index(genome, sa_rate=4, lut_k=6)
    didx = device_index(index)
    read = np.tile(unit, 2)[:100]
    batch = ReadBatch([b"rep"], read[None, :].copy(),
                      np.asarray([100], np.int32), None)

    recs = []

    class Cap:
        needs_seq = False
        needs_tags = True

        def write(self, rec):
            recs.append(rec)

    # raise the reference-parity occurrence clamp (MaxOutputPerRead)
    # past the repeat's copy count so enumeration is complete
    opts = AlignOptions(max_output_per_read=1_000_000)
    s = align_single_batch(index, didx, batch, opts, Cap())
    assert s.still_flagged == 0
    assert s.aligned_bwt == 1
    expect0 = sum(1 for (st, p), m in
                  brute_hits(genome.codes, read, 2).items() if m == 0)
    x0 = [t for t in recs[0].tags if t.startswith("X0:i:")]
    assert x0 and int(x0[0][5:]) == expect0


def test_occ_cap_truncates_and_keeps_flag(repeat_genome):
    """With the reference-parity occurrence clamp
    (CPUfunctions.cpp:1287-1299) a super-repetitive read's decode is
    truncated, stays flagged, and returns at most the cap per strand."""
    genome, unit = repeat_genome
    index = build_index(genome, sa_rate=4, lut_k=6)
    read = np.tile(unit, 2)[:100]
    strand, tp, nm, over = host_search.complete_search(
        index, read, 100, 2, max_decode=500)
    assert over
    for s in (0, 1):
        assert (strand == s).sum() <= 3 * 500  # k+1 segs, 500/strand cap


def test_realign_storm_threshold_skips_batch(repeat_genome, rng):
    """When more flagged reads than `budget` arrive (a satellite
    storm), realign_flagged skips the batch whole: reads keep their
    device hit sets and stay flagged; under the threshold every read
    is re-aligned."""
    from soap3dp_tpu.fm.search import HitArrays

    genome, unit = repeat_genome
    index = build_index(genome, sa_rate=4, lut_k=6)
    B = 4
    codes = np.stack([np.tile(unit, 2)[:100]] * B)
    lens = np.full(B, 100, np.int32)

    def fresh():
        return HitArrays(row=np.zeros(0, np.int32),
                         tp=np.zeros(0, np.uint32),
                         nmis=np.zeros(0, np.int32),
                         valid=np.zeros(0, bool),
                         flagged=np.ones(B, bool))

    # storm: 4 flagged > budget 2 -> untouched (same object semantics)
    out = host_search.realign_flagged(index, fresh(), codes, lens, k=2,
                                      max_decode=200, budget=2)
    assert np.asarray(out.flagged).all()
    assert len(np.asarray(out.row)) == 0
    # under threshold: all re-aligned, hits for every read
    out = host_search.realign_flagged(index, fresh(), codes, lens, k=2,
                                      max_decode=200, budget=8)
    assert len(np.asarray(out.row)) > 0
    got_reads = set((np.asarray(out.row) % B).tolist())
    assert got_reads == {0, 1, 2, 3}
