"""2BWT/FM-index builder with a TPU-first memory layout.

Replaces the reference's three-artifact pipeline (soap3-dp-builder ->
.bwt/.fmv/.sa/.lkt files, then BGS-Build -> .fmv.gpu GPU occ tables,
2bwt-flex/2BWT-Builder.c:306-460 and BGS-Build.cpp:139-194) with a
single builder that directly emits accelerator-ready flat arrays:

* ``fmi``: one uint32[12] row per 128bp BWT block =
  [occ(A), occ(C), occ(G), occ(T), bwt words 0..7]. The reference's GPU
  occ table has the same per-128-position cumulative-count granularity
  (GPU_OCC_INTERVAL 128, definitions.h:94; BGS-Build.cpp:146-161) but
  keeps counts and BWT words in separate buffers; interleaving them
  makes one HBM gather serve a full Occ query on TPU.
* value-sampled suffix array: rows whose SA value is a multiple of
  ``sa_rate`` are marked in a bitvector with a per-block rank
  directory, giving the SA-decode walk a hard ``sa_rate``-step bound.
  (The reference samples rows instead — BWTGenerateSaValue,
  2BWT-Builder.c:455-457 — which leaves the walk unbounded; a hard
  bound is what makes the walk a fixed-shape TPU loop.)
* k-mer lookup table with [lo, hi) SA-interval per k-mer, the analog of
  the reference's 13-mer LT (2bwt-flex/LT.h:49-56).

Only the forward BWT is built. The reference also builds a reverse BWT
for bidirectional search in its mismatch-case enumeration
(DV-Kernel.cu cases A-F); the rebuilt aligner uses pigeonhole
seed-and-verify instead, which needs backward search only.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from soap3dp_tpu.index.packing import PackedGenome, pack_fasta
from soap3dp_tpu.index.suffix_array import bwt_from_sa, suffix_array
from soap3dp_tpu.utils import dna

OCC_INTERVAL = 128           # bases per fmi block (definitions.h:94)
WORDS_PER_BLOCK = OCC_INTERVAL // dna.BASES_PER_WORD  # 8
FMI_ROW = 4 + WORDS_PER_BLOCK  # occ4 + 8 words = 12 uint32
MARK_ROW = 5                 # [rank, 4 mark words] per 128 rows
PAC_PAD_WORDS = 64           # guard words so window gathers never go OOB

FORMAT_VERSION = 1


@dataclasses.dataclass
class Index:
    """Host-side (numpy) index. See DeviceIndex for the HBM-resident view."""

    n: int                   # text length (concatenated genome)
    primary: int             # row of the sentinel in the conceptual BWT
    counts: np.ndarray       # (5,) uint32: C array, counts[c] = |{x < c}| incl. sentinel
    fmi: np.ndarray          # (nb, 12) uint32 interleaved occ + BWT words
    mark: np.ndarray         # (nb, 5) uint32 SA-sample bitvector + rank directory
    sa_samples: np.ndarray   # (num_samples,) uint32
    sa_rate: int             # sampling rate d (walk bound)
    lut_lo: np.ndarray       # (4^lut_k,) uint32
    lut_hi: np.ndarray       # (4^lut_k,) uint32
    lut_k: int
    pac: np.ndarray          # packed genome words incl. guard padding
    names: list[str]
    offsets: np.ndarray      # (num_chrom+1,) uint64
    amb_starts: np.ndarray   # (num_amb,) uint64 — excluded-region starts
    amb_ends: np.ndarray     # (num_amb,) uint64

    @property
    def num_rows(self) -> int:
        return self.n + 1


def build_index(
    genome: PackedGenome,
    sa_rate: int = 8,
    lut_k: int | None = None,
) -> Index:
    """Build the full index from a packed genome."""
    import sys
    import time

    verbose = bool(os.environ.get("SOAP3DP_BUILD_VERBOSE")) or genome.length > 500_000_000
    t0 = time.time()

    def _log(stage: str) -> None:
        if verbose:
            print(f"[build +{time.time() - t0:6.0f}s] {stage}",
                  file=sys.stderr, flush=True)

    codes = genome.codes
    n = genome.length
    _log(f"suffix array ({n / 1e6:.0f} Mbp)...")
    sa = suffix_array(codes)
    _log("bwt from sa...")
    bwt, primary = bwt_from_sa(codes, sa)

    # C array over the 4-letter alphabet, with the sentinel counted as
    # the unique smallest character: counts[c] = 1 + #chars < c.
    base_counts = np.bincount(codes, minlength=4).astype(np.uint64)
    counts = np.zeros(5, dtype=np.uint32)
    counts[0] = 1
    counts[1:] = (1 + np.cumsum(base_counts)).astype(np.uint32)
    # counts layout: counts[c] = C[c] for backward search; counts[4] = n+1.

    _log("fmi blocks...")
    fmi = _build_fmi(bwt, n)
    del bwt  # multi-GB at genome scale; not needed past the fmi build
    _log("sa sampling...")
    mark, sa_samples = _build_sa_sampling(sa, n, sa_rate)
    if lut_k is None:
        lut_k = 13 if n >= 1_000_000 else max(2, min(8, int(np.log2(max(n, 16))) // 2))
    _log(f"lut (k={lut_k})...")
    lut_lo, lut_hi = _build_lut(codes, sa, lut_k)
    del sa
    _log("done")

    pac = np.concatenate([genome.pac, np.zeros(PAC_PAD_WORDS, dtype=np.uint32)])

    amb_starts, amb_ends = genome.excluded_region_mask()
    return Index(
        n=n,
        primary=primary,
        counts=counts,
        fmi=fmi,
        mark=mark,
        sa_samples=sa_samples,
        sa_rate=sa_rate,
        lut_lo=lut_lo,
        lut_hi=lut_hi,
        lut_k=lut_k,
        pac=pac,
        names=genome.names,
        offsets=genome.offsets,
        amb_starts=amb_starts,
        amb_ends=amb_ends,
    )


def _build_fmi(bwt: np.ndarray, n: int) -> np.ndarray:
    """Interleave per-block cumulative occ counts with packed BWT words."""
    nb = n // OCC_INTERVAL + 1
    padded = np.full(nb * OCC_INTERVAL, 255, dtype=np.uint8)
    padded[:n] = bwt
    # Per-block counts of each base (memory-light: one bool pass per base;
    # padding is code 255 so it never counts).
    starts = np.arange(nb) * OCC_INTERVAL
    block_counts = np.empty((nb, 4), dtype=np.uint32)
    for c in range(4):
        block_counts[:, c] = np.add.reduceat((padded == c), starts)
    occ = np.zeros((nb, 4), dtype=np.uint32)
    np.cumsum(block_counts[:-1], axis=0, out=occ[1:])
    padded[padded == 255] = 0  # pack padding as A (masked by occ counts)

    words = dna.pack_codes(padded).reshape(nb, WORDS_PER_BLOCK)
    return np.concatenate([occ, words], axis=1).astype(np.uint32)


def _build_sa_sampling(sa: np.ndarray, n: int, rate: int) -> tuple[np.ndarray, np.ndarray]:
    """Value-sampled SA: bitvector + per-block rank + sample values."""
    assert rate & (rate - 1) == 0, "sa_rate must be a power of two"
    nb = n // OCC_INTERVAL + 1
    marked = (sa % rate) == 0
    rows = np.flatnonzero(marked)
    sa_samples = sa[rows].astype(np.uint32)

    bits = np.zeros(nb * OCC_INTERVAL, dtype=bool)
    bits[rows] = True
    lanes = bits.reshape(nb * 4, 32).astype(np.uint32)
    words = np.bitwise_or.reduce(lanes << np.arange(32, dtype=np.uint32)[None, :], axis=1)
    words = words.reshape(nb, 4)

    per_block = bits.reshape(nb, OCC_INTERVAL).sum(axis=1, dtype=np.uint32)
    rank = np.zeros(nb, dtype=np.uint32)
    np.cumsum(per_block[:-1], out=rank[1:])
    return np.concatenate([rank[:, None], words], axis=1).astype(np.uint32), sa_samples


def _build_lut(codes: np.ndarray, sa: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """[lo, hi) SA-row interval for every k-mer.

    Keys are base-5 with digit 0 reserved for past-the-end (sentinel),
    so suffixes shorter than k sort strictly below any k-mer that they
    prefix — exactly matching backward-search semantics.
    """
    n = codes.shape[0]
    # Row counts, not searches: the SA rows whose suffix starts with
    # pattern m form a contiguous run of length #occurrences(m), and
    # lo[m] = 1 (sentinel row) + #short suffixes sorting below m
    #       + #full k-mers with pattern < m.
    # So the whole table is one k-pass rolling k-mer value over the
    # text + a bincount + cumsum — no suffix-array access at all.
    del sa  # unused: kept for signature stability
    mt = np.zeros(n, dtype=np.int32)
    for j in range(k):
        # one transient int32 temp at a time (peak 2 passes of n*4B, not 3)
        tmp = codes[j:].astype(np.int32)
        np.left_shift(tmp, 2 * (k - 1 - j), out=tmp)
        mt[: n - j] += tmp
        del tmp
    size = 4 ** k
    valid = max(n - k + 1, 0)
    cnts = np.bincount(mt[:valid], minlength=size).astype(np.int64)
    # short suffixes (length 1..k-1): each sorts immediately before the
    # patterns it prefixes (its past-the-end ranks below any base)
    bumps = np.zeros(size, dtype=np.int64)
    for start in range(valid, n):
        m_v = 0
        for j in range(n - start):
            m_v |= int(codes[start + j]) << (2 * (k - 1 - j))
        bumps[m_v] += 1
    lo64 = 1 + np.concatenate(([0], np.cumsum(cnts[:-1]))) + np.cumsum(bumps)
    hi64 = lo64 + cnts
    return lo64.astype(np.uint32), hi64.astype(np.uint32)


# ------------------------------------------------------------------
# Serialization: a directory of .npy files plus meta.json, the analog
# of the reference's .bwt/.fmv/.sa/.lkt/.pac/.ann/.amb/.tra file set
# (IndexHandler.h:61-84).
# ------------------------------------------------------------------

_ARRAYS = ["counts", "fmi", "mark", "sa_samples", "lut_lo", "lut_hi", "pac",
           "offsets", "amb_starts", "amb_ends"]


def save_index(index: Index, path: str | os.PathLike) -> None:
    os.makedirs(path, exist_ok=True)
    meta = {
        "format_version": FORMAT_VERSION,
        "n": index.n,
        "primary": index.primary,
        "sa_rate": index.sa_rate,
        "lut_k": index.lut_k,
        "names": index.names,
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    for name in _ARRAYS:
        np.save(os.path.join(path, f"{name}.npy"), getattr(index, name))


def load_index(path: str | os.PathLike) -> Index:
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported index format {meta['format_version']}")
    arrays = {name: np.load(os.path.join(path, f"{name}.npy"), mmap_mode="r")
              for name in _ARRAYS}
    # mmap keeps load cheap; materialize small arrays.
    return Index(
        n=meta["n"],
        primary=meta["primary"],
        sa_rate=meta["sa_rate"],
        lut_k=meta["lut_k"],
        names=meta["names"],
        **arrays,
    )


def build_index_from_fasta(fasta_path: str | os.PathLike, **kwargs) -> Index:
    return build_index(pack_fasta(fasta_path), **kwargs)
