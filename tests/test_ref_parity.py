"""Differential validation against the REFERENCE index builder.

Compiles the reference's CUDA-free builder (2bwt-flex/2BWT-Builder.c)
and BGS-Build (BGS-Build.cpp), builds the same FASTA with it and with
our builder, and asserts semantic equivalence of every shared artifact
(VERDICT r2 item 4). This is the cross-implementation ground truth the
frozen golden-SAM fixtures cannot provide.

Known, intended divergence (PARITY.md): the reference DISCARDS runs of
>= 10 non-ACGT characters from its packed text (coordinates shifted,
restored via the .amb table at output; HSP.c:849-896), while we keep
them G-substituted and filter hits overlapping them. The fixture
genome therefore uses only short (< 10) ambiguous runs, where both
parsers agree the run becomes literal 'G's.
"""

import os

import numpy as np
import pytest

from tests import ref_builder

pytestmark = pytest.mark.skipif(
    ref_builder.ensure_tools() is None,
    reason="reference tree or compiler unavailable")

GENOME_BP = 5_000_000
LUT_K = 10


@pytest.fixture(scope="session")
def ref_fixture(tmp_path_factory):
    """Reference index of a 5 Mbp deterministic genome (cached on disk
    across sessions: the -O0 reference builder takes ~30 s)."""
    cache = os.path.join(ref_builder.REFBUILD, f"fixture{GENOME_BP}")
    fasta = os.path.join(cache, "g.fa")
    prefix = fasta + ".index"
    if not os.path.exists(prefix + ".fmv.gpu"):
        os.makedirs(cache, exist_ok=True)
        rng = np.random.default_rng(42)
        codes = rng.integers(0, 4, GENOME_BP, dtype=np.uint8)
        seq = np.frombuffer(b"ACGT", np.uint8)[codes].tobytes().decode()
        # short ambiguous runs (< 10: substituted with G by both)
        seq = (seq[:1_000_000] + "NNN" + seq[1_000_000:3_999_000]
               + "RYKM" + seq[3_999_000:])
        with open(fasta, "w") as fh:
            a, b = seq[:3_000_000], seq[3_000_000:]
            fh.write(">chrA test description\n")
            for i in range(0, len(a), 70):
                fh.write(a[i:i + 70] + "\n")
            fh.write(">chrB\n")
            for i in range(0, len(b), 70):
                fh.write(b[i:i + 70] + "\n")
        ref_builder.build_ref_index(fasta, table_size=LUT_K, sa_freq=1)
    return fasta, prefix


@pytest.fixture(scope="session")
def ours(ref_fixture):
    from soap3dp_tpu.index.builder import build_index
    from soap3dp_tpu.index.packing import pack_fasta

    fasta, _ = ref_fixture
    genome = pack_fasta(fasta)
    return genome, build_index(genome, sa_rate=1, lut_k=LUT_K)


def test_packed_text_identical(ref_fixture, ours):
    """Same concatenated 2-bit text: N->G substitution, coordinates."""
    _, prefix = ref_fixture
    genome, _ = ours
    ref_text = ref_builder.read_pac(prefix)
    assert len(ref_text) == genome.length
    assert np.array_equal(ref_text, genome.codes)


def test_annotation_matches(ref_fixture, ours):
    _, prefix = ref_fixture
    genome, _ = ours
    n, seqs = ref_builder.read_ann(prefix)
    assert n == genome.length
    assert [s[0] for s in seqs] == genome.names
    starts = np.asarray([s[1] for s in seqs], np.uint64)
    lens = np.asarray([s[2] for s in seqs], np.uint64)
    assert np.array_equal(starts, genome.offsets[:-1])
    assert np.array_equal(starts + lens, genome.offsets[1:])


def test_bwt_and_primary_identical(ref_fixture, ours):
    """BWT string (sentinel removed) and inverseSa0 match exactly."""
    from soap3dp_tpu.index.suffix_array import bwt_from_sa, suffix_array

    _, prefix = ref_fixture
    genome, idx = ours
    inv, cum, ref_bwt = ref_builder.read_bwt(prefix)
    assert idx.primary == inv
    # counts convention: ours[c+1] = 1 (sentinel) + cumfreq[c]
    assert np.array_equal(idx.counts[1:].astype(np.int64), cum + 1)
    sa = suffix_array(genome.codes)
    bwt, primary = bwt_from_sa(genome.codes, sa)
    assert primary == inv
    assert np.array_equal(bwt, ref_bwt)


def test_full_suffix_array_identical(ref_fixture, ours):
    """Row-for-row SA equality at SaValueFreq=1 (row 0 = sentinel = n)."""
    from soap3dp_tpu.index.suffix_array import suffix_array

    _, prefix = ref_fixture
    genome, _ = ours
    interval, ref_sa = ref_builder.read_sa(prefix)
    assert interval == 1
    sa = suffix_array(genome.codes)
    assert np.array_equal(sa.astype(np.uint32), ref_sa)


def test_occ_blocks_match_gpu_table(ref_fixture, ours):
    """Per-128bp cumulative occ counts == BGS-Build's GPU table
    (BGS-Build.cpp:146-161), up to the documented cumFreq fold-in."""
    _, prefix = ref_fixture
    _, idx = ours
    inv, cum, gpu = ref_builder.read_gpu_occ(prefix)
    assert inv == idx.primary
    prefix_cum = np.concatenate([[0], cum[:3]])  # chars < c, no sentinel
    # our occ is per-16bp word; the 128bp block boundaries are every
    # 8th word (same cumulative-count semantics, finer granularity)
    nw = idx.bwt.shape[0]
    occ = np.asarray(idx.occ).reshape(nw, 4)
    ours_128 = occ[:: 8]
    nb = min(gpu.shape[0], ours_128.shape[0])
    ours_abs = ours_128[:nb].astype(np.int64) + prefix_cum[None, :]
    assert np.array_equal(ours_abs, gpu[:nb].astype(np.int64))


def test_lut_kmer_counts_match(ref_fixture, ours):
    """Per-k-mer occurrence counts match except the k-1 text-tail
    k-mers the reference pads with A (LTConstruct.c:96), which each
    gain exactly one count."""
    _, prefix = ref_fixture
    genome, idx = ours
    k, tab = ref_builder.read_lkt(prefix)
    assert k == idx.lut_k
    ref_cnt = np.diff(np.concatenate([[0], tab.astype(np.int64)]))
    our_cnt = idx.lut_hi.astype(np.int64) - idx.lut_lo
    d = ref_cnt - our_cnt
    bad = np.flatnonzero(d)
    assert len(bad) <= k - 1 and (d[bad] >= 1).all()
    # the differing k-mers are exactly the A-padded tails of the text
    tail = np.concatenate([genome.codes[-(k - 1):], np.zeros(k - 1, np.uint8)])
    pad_kmers = set()
    for s in range(k - 1):
        v = 0
        for j in range(k):
            v = (v << 2) | int(tail[s + j])
        pad_kmers.add(v)
    assert set(bad.tolist()) <= pad_kmers
