"""Seed-and-verify k-mismatch search: the TPU-native BWT alignment stage.

The reference finds all <=k-mismatch alignments with per-thread
bidirectional-BWT case enumeration (cases A-F over read cells,
DV-Kernel.cu:3656-4502, case tables definitions.h:97-121). That design
is efficient per CUDA thread but maximally divergent — every lane
follows its own branch-and-prune path — which is exactly wrong for a
TPU's 8x128 lockstep VPU.

This module produces the *same result set* with a uniform pipeline:

1. pigeonhole seeds: split each read into k+1 segments — any placement
   with <=k mismatches matches at least one segment exactly;
2. batched exact backward search of every (read, strand, segment),
   LUT-jumpstarted — static shapes, no divergence;
3. bounded SA decode of every surviving interval (cap per seed);
4. packed XOR/popcount verification of each candidate placement
   against the genome (the reference's check-and-extend idea,
   2bwt-flex/SRA2BWTCheckAndExtend.h:57-66, promoted from a fallback
   to the main verification path);
5. per-read dedupe (a placement can be found by several seeds).

Reads with an over-budget seed interval are flagged and re-run by the
host wrapper with a larger cap — the same two-round budget scheme as
the reference (perform_round1/round2_alignment, alignment.cu:118-221;
sentinels DV-Kernel.cu:4464-4486).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from soap3dp_tpu.fm import fmindex
from soap3dp_tpu.fm.fmindex import DeviceIndex, U32

SENTINEL = jnp.uint32(0xFFFFFFFF)


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Static search parameters (part of the jit cache key)."""

    k: int = 2                # max mismatches (reference -s: 0..4)
    occ_cap: int = 16         # round-1 SA-interval budget per seed
    occ_cap_round2: int = 256  # round-2 budget (reference sa_range round2)

    @property
    def num_seeds(self) -> int:
        return self.k + 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HitArrays:
    """Struct-of-arrays hit set for a batch, on device.

    Layout: R = 2*B oriented rows (row b = read b forward, row B+b =
    read b reverse-complement), each with H = num_seeds*cap hit slots.
    """

    tp: jax.Array      # (R, H) uint32 text position of the read start
    nmis: jax.Array    # (R, H) int32 mismatch count
    valid: jax.Array   # (R, H) bool
    flagged: jax.Array  # (B,) bool — needs a bigger-budget re-run

    def to_host(self):
        return (np.asarray(self.tp), np.asarray(self.nmis),
                np.asarray(self.valid), np.asarray(self.flagged))


def _seed_bounds(lens: jax.Array, num_seeds: int) -> tuple[jax.Array, jax.Array]:
    """Evenly split [0, len) into num_seeds segments: (R, S) starts/lengths."""
    j = jnp.arange(num_seeds, dtype=jnp.int32)[None, :]
    start = j * lens[:, None] // num_seeds
    end = (j + 1) * lens[:, None] // num_seeds
    return start, end - start


@partial(jax.jit, static_argnames=("cfg", "cap", "max_seed_steps"))
def _search_batch(
    idx: DeviceIndex,
    reads: jax.Array,   # (B, L) uint8 forward-strand codes
    lens: jax.Array,    # (B,) int32
    cfg: SearchConfig,
    cap: int,
    max_seed_steps: int,
) -> HitArrays:
    B, L = reads.shape
    S = cfg.num_seeds
    W = (L + 15) // 16
    n = idx.n

    # oriented rows: forward then reverse-complement
    oriented = jnp.concatenate([reads, fmindex.revcomp_reads(reads, lens)], axis=0)
    olens = jnp.concatenate([lens, lens])
    R = 2 * B

    # (R, S) seed segments -> flat (R*S,) search lanes
    sstart, slen = _seed_bounds(olens, S)
    seq_rows = jnp.repeat(jnp.arange(R, dtype=jnp.int32), S)
    l, r = fmindex.backward_search(
        idx,
        oriented[seq_rows],
        sstart.reshape(-1),
        slen.reshape(-1),
        max_steps=max_seed_steps,
    )
    width = r - l
    overflow = width > U32(cap)
    flagged = overflow.reshape(B * 2, S).any(axis=1)
    flagged = flagged[:B] | flagged[B:]

    # enumerate up to cap rows per seed (skip overflowed seeds entirely;
    # their reads re-run in round 2 with a larger cap)
    slot = jnp.arange(cap, dtype=jnp.uint32)[None, :]
    rows = l[:, None] + slot                                # (R*S, cap)
    enum_ok = (slot < width[:, None]) & ~overflow[:, None]

    sa_pos = fmindex.sa_decode(idx, rows.reshape(-1), enum_ok.reshape(-1))
    sa_pos = sa_pos.reshape(R * S, cap)

    # candidate read-start position; reject if the seed offset runs off
    # the front or the full read off the back of the genome
    st = sstart.reshape(-1).astype(U32)[:, None]
    tp = sa_pos - st
    ln = olens[seq_rows].astype(U32)[:, None]
    pos_ok = enum_ok & (sa_pos >= st) & (tp + ln <= n)

    # verify in the packed domain
    read_words = fmindex.pack_reads(oriented)               # (R, W)
    cand_row = jnp.repeat(seq_rows, cap)
    nmis = fmindex.count_mismatches_packed(
        idx,
        jnp.where(pos_ok, tp, U32(0)).reshape(-1),
        read_words[cand_row],
        olens[cand_row],
    ).reshape(R * S, cap)
    hit_ok = pos_ok & (nmis <= cfg.k)

    # per-oriented-row dedupe across the S*cap slots (a placement can be
    # found by several exact seeds): small per-row sort + neighbor mask
    H = S * cap
    tp_row = jnp.where(hit_ok, tp, SENTINEL).reshape(R, H)
    nmis_row = nmis.reshape(R, H)
    order = jnp.argsort(tp_row, axis=1)
    tp_sorted = jnp.take_along_axis(tp_row, order, axis=1)
    nmis_sorted = jnp.take_along_axis(nmis_row, order, axis=1)
    first = jnp.concatenate(
        [jnp.ones((R, 1), bool), tp_sorted[:, 1:] != tp_sorted[:, :-1]], axis=1)
    valid = first & (tp_sorted != SENTINEL)

    return HitArrays(tp=tp_sorted, nmis=nmis_sorted, valid=valid, flagged=flagged)


def search_reads(
    idx: DeviceIndex,
    reads: np.ndarray | jax.Array,
    lens: np.ndarray | jax.Array,
    cfg: SearchConfig = SearchConfig(),
) -> HitArrays:
    """Two-round seed search over a read batch.

    Round 1 runs every read with the small per-seed budget; reads with
    an over-budget seed are re-run in round 2 with `occ_cap_round2`.
    Reads still over budget in round 2 keep `flagged=True` — the
    pipeline treats them like the reference's 0xFFFFFFFE "too many
    hits" sentinel (DV-Kernel.cu:4464-4486).
    """
    reads = jnp.asarray(reads)
    lens = jnp.asarray(lens, dtype=jnp.int32)
    B, L = reads.shape
    steps = _max_seed_steps(idx, int(np.max(np.asarray(lens))) if B else 0, cfg.num_seeds)
    hits = _search_batch(idx, reads, lens, cfg, cfg.occ_cap, steps)
    flagged = np.asarray(hits.flagged)
    if not flagged.any():
        return hits
    # round 2: bigger budget for the flagged reads only. The subset is
    # padded to a power-of-two bucket so repeated batches reuse the
    # compiled executable (shape churn = one remote XLA compile each).
    from soap3dp_tpu.utils import shapes

    sel = np.flatnonzero(flagged)
    nb = min(shapes.bucket(len(sel), min_size=64), B)
    reads_h = np.asarray(reads)
    lens_h = np.asarray(lens)
    sel_pad = np.concatenate([sel, np.zeros(nb - len(sel), np.int64)]) \
        if len(sel) < nb else sel[:nb]
    hits2 = _search_batch(idx, jnp.asarray(reads_h[sel_pad]),
                          jnp.asarray(lens_h[sel_pad]),
                          cfg, cfg.occ_cap_round2, steps)
    hits2 = _slice_hits(hits2, len(sel), nb)
    return _merge_round2(hits, hits2, sel, B, cfg)


def _slice_hits(h: HitArrays, n: int, padded: int) -> HitArrays:
    """Drop pad rows: keep forward rows [0:n] and rc rows [padded:padded+n]."""
    if n == padded:
        return h
    rows = np.concatenate([np.arange(n), padded + np.arange(n)])
    return HitArrays(tp=np.asarray(h.tp)[rows], nmis=np.asarray(h.nmis)[rows],
                     valid=np.asarray(h.valid)[rows],
                     flagged=np.asarray(h.flagged)[:n])


def _max_seed_steps(idx: DeviceIndex, max_len: int, num_seeds: int) -> int:
    """Static step bound: longest segment, minus the LUT jumpstart when
    every segment is long enough to use it."""
    longest = -(-max_len // num_seeds) if max_len else 0
    shortest = max_len // num_seeds
    if shortest >= idx.lut_k:
        return max(longest - idx.lut_k, 0)
    return longest


def _merge_round2(h1: HitArrays, h2: HitArrays, sel: np.ndarray, B: int,
                  cfg: SearchConfig) -> HitArrays:
    """Replace flagged reads' round-1 rows with their round-2 results.

    Round-2 rows have more hit slots (bigger cap); round-1 rows are
    padded to match so the result stays one rectangular batch.
    """
    H2 = h2.tp.shape[1]
    tp, nm, va = (np.asarray(h1.tp), np.asarray(h1.nmis), np.asarray(h1.valid))
    pad = H2 - tp.shape[1]
    tp = np.pad(tp, ((0, 0), (0, pad)), constant_values=0xFFFFFFFF)
    nm = np.pad(nm, ((0, 0), (0, pad)))
    va = np.pad(va, ((0, 0), (0, pad)))
    rows = np.concatenate([sel, B + sel])  # fwd + rc rows of flagged reads
    tp[rows] = np.asarray(h2.tp)
    nm[rows] = np.asarray(h2.nmis)
    va[rows] = np.asarray(h2.valid)
    flagged = np.zeros(B, bool)
    flagged[sel] = np.asarray(h2.flagged)
    return HitArrays(tp=jnp.asarray(tp), nmis=jnp.asarray(nm),
                     valid=jnp.asarray(va), flagged=jnp.asarray(flagged))
