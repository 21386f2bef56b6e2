"""Batched semi-global affine-gap DP: anti-diagonal wavefront + traceback.

TPU-native replacement for the reference's per-thread full-table DP
(SemiGlobalAligntment / GPUBacktrack, DV-DPfunctions.cu:146-512).
The reference fills the (read x window) table cell-by-cell per CUDA
thread with a 32-thread-interleaved layout; here the whole batch
advances one anti-diagonal per step, so every vector op is a full-width
(P, Lr+1) VPU operation with no divergence:

    H[i,j] = max(H[i-1,j-1] + subst, D[i,j], I[i,j])
    D[i,j] = max(H[i,j-1] + open, D[i,j-1] + ext)     # window gap
    I[i,j] = max(H[i-1,j] + open, I[i-1,j] + ext, fresh)  # read gap

where cells on anti-diagonal d = i + j depend only on diagonals d-1 and
d-2. Semantics (clip/anchor rules, tie-breaks, traceback priorities)
exactly match the reference; tests/dp_oracle.py is the executable spec.

Instead of re-deriving the path from scores like GPUBacktrack, the
forward pass emits a 5-bit direction byte per cell (priorities baked
in: diag > D-open > D-ext > clip-SM > clip-SI > I-open > I-ext), and
the traceback is a masked batched walk over the direction tensor.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

NEG = -32000      # DP_SCORE_NEG_INFINITY (DV-DPfunctions.cu:52)
NEG_BIG = -(1 << 20)  # masking value, far below any reachable score

# direction encodings
DH_DIAG, DH_D, DH_SM, DH_I = 0, 1, 2, 3
DD_OPEN, DD_EXT = 0, 1
DI_FRESH, DI_OPEN, DI_EXT = 0, 1, 2

# traceback op codes
OP_NONE, OP_MATCH, OP_MISMATCH, OP_INS, OP_DEL, OP_CLIP = 0, 1, 2, 3, 4, 5
OP_CHARS = {OP_MATCH: "M", OP_MISMATCH: "m", OP_INS: "I", OP_DEL: "D", OP_CLIP: "S"}


@dataclasses.dataclass(frozen=True)
class DPScores:
    """Scoring scheme (soap3-dp.ini [DP]: 1 / -2 / -3 / -1 defaults)."""

    match: int = 1
    mismatch: int = -2
    gap_open: int = -3   # cost of a length-1 gap
    gap_ext: int = -1

    @property
    def gap_init(self) -> int:
        return self.gap_open - self.gap_ext


def _clamp(x):
    return jnp.maximum(x, NEG)


def _shift(v):
    """v[..., i] -> v[..., i-1]; lane 0 filled with NEG_BIG."""
    return jnp.concatenate(
        [jnp.full(v.shape[:-1] + (1,), NEG_BIG, v.dtype), v[..., :-1]], axis=-1)


@partial(jax.jit, static_argnames=("sc",))
def dp_forward(
    reads: jax.Array,    # (P, Lr) uint8 codes
    rlens: jax.Array,    # (P,) int32
    wins: jax.Array,     # (P, Lw) uint8 codes
    wlens: jax.Array,    # (P,) int32
    clip_l: jax.Array,   # (P,) int32 max free left soft-clip
    clip_r: jax.Array,   # (P,) int32 max free right soft-clip
    anchor_l: jax.Array,  # (P,) int32: window start must be < anchor_l (1-based)
    anchor_r: jax.Array,  # (P,) int32: window end must be >= anchor_r (1-based)
    sc: DPScores = DPScores(),
):
    """Returns (best_score, hit_i, hit_j, count, dirs).

    hit_i/hit_j are 1-based end coordinates of the best cell (read chars
    consumed = hit_i, i.e. right clip = rlen - hit_i; window chars
    consumed = hit_j). count = number of eligible cells achieving the
    best score (the reference's maxScoreCount). dirs has shape
    (Lr+Lw, P, Lr+1) uint8 — direction byte of each cell, diag-major.
    """
    P, Lr = reads.shape
    Lw = wins.shape[1]
    m, mm, go, ge, gi = sc.match, sc.mismatch, sc.gap_open, sc.gap_ext, sc.gap_init
    i_vec = jnp.arange(Lr + 1, dtype=jnp.int32)[None, :]           # (1, Lr+1)
    reads_pad = jnp.concatenate(
        [jnp.zeros((P, 1), reads.dtype), reads], axis=1).astype(jnp.int32)

    # column j=0 (free start / clipped-prefix inits)
    col0_raw = jnp.where(i_vec == 0, 0,
                         jnp.where(i_vec <= clip_l[:, None], go,
                                   gi + ge * (i_vec - jnp.minimum(clip_l[:, None], i_vec))))
    col0_H = _clamp(col0_raw)
    col0_D = _clamp(col0_raw + gi)

    h0 = jnp.full((P, Lr + 1), NEG_BIG, jnp.int32).at[:, 0].set(0)
    d0 = jnp.full((P, Lr + 1), NEG_BIG, jnp.int32).at[:, 0].set(_clamp(jnp.int32(gi)))
    i0 = jnp.full((P, Lr + 1), NEG_BIG, jnp.int32)
    hm1 = jnp.full((P, Lr + 1), NEG_BIG, jnp.int32)
    chars0 = jnp.full((P, Lr + 1), -1, jnp.int32)

    best0 = (jnp.full((P,), NEG, jnp.int32), jnp.zeros((P,), jnp.int32),
             jnp.zeros((P,), jnp.int32), jnp.zeros((P,), jnp.int32))

    def step(carry, d):
        H1, H2, D1, I1, chars, (bS, bJ, bI, bC) = carry
        j_vec = d - i_vec                                           # (1, Lr+1)
        # window char entering this diagonal at lane 0: win[:, d-1]
        newc = jnp.take_along_axis(
            wins, jnp.clip(d - 1, 0, Lw - 1)[None, None].repeat(P, 0), axis=1
        )[:, 0].astype(jnp.int32)
        chars = jnp.concatenate([newc[:, None], chars[:, :-1]], axis=1)

        init_j = jnp.where(j_vec < anchor_l[:, None], 0, NEG)
        init_jm1 = jnp.where(j_vec - 1 < anchor_l[:, None], 0, NEG)
        fresh_ok = (i_vec - 1) <= clip_l[:, None]

        dist = jnp.where(chars == reads_pad, m, mm)

        # D state: gap in the read (window char consumed), deps at (i, j-1)
        d_open = go + H1
        d_ext = ge + D1
        D_new = _clamp(jnp.maximum(d_open, d_ext))
        dD = (d_ext > d_open).astype(jnp.int32)                     # tie -> open

        # I state: gap in the window (read char consumed), deps at (i-1, j)
        H1s, I1s, H2s = _shift(H1), _shift(I1), _shift(H2)
        i_fresh = jnp.where(fresh_ok, init_j + go, NEG_BIG)
        i_open = go + H1s
        i_ext = ge + I1s
        I_new = _clamp(jnp.maximum(i_fresh, jnp.maximum(i_open, i_ext)))
        dI = jnp.where(I_new == i_fresh, DI_FRESH,
                       jnp.where(I_new == i_open, DI_OPEN, DI_EXT))

        # H state
        diag_true = dist + H2s
        diag_fresh = jnp.where(fresh_ok, init_jm1 + dist, NEG_BIG)
        H_new = _clamp(jnp.maximum(jnp.maximum(diag_true, diag_fresh),
                                   jnp.maximum(D_new, I_new)))
        dH = jnp.where(H_new == diag_true, DH_DIAG,
                       jnp.where((H_new == d_open) | (H_new == d_ext), DH_D,
                                 jnp.where(H_new == diag_fresh, DH_SM, DH_I)))

        # boundary lanes: i == d is column j=0; lane 0 is row i=0
        on_col0 = i_vec == d
        H_new = jnp.where(on_col0, col0_H, H_new)
        D_new = jnp.where(on_col0, col0_D, D_new)
        I_new = jnp.where(on_col0, NEG_BIG, I_new)
        H_new = H_new.at[:, 0].set(_clamp(init_j[:, 0]))
        D_new = D_new.at[:, 0].set(NEG_BIG)
        I_new = I_new.at[:, 0].set(_clamp(init_j[:, 0] + gi))

        dirs = (dH | (dD << 2) | (dI << 3)).astype(jnp.uint8)

        # best-cell tracking over eligible cells
        elig = ((i_vec >= 1) & (i_vec <= rlens[:, None]) & (j_vec >= 1)
                & (j_vec <= wlens[:, None])
                & (i_vec >= (rlens - clip_r)[:, None])
                & (j_vec >= anchor_r[:, None]))
        escore = jnp.where(elig, H_new, NEG_BIG)
        s_star = escore.max(axis=1)
        # among ties within the diagonal prefer the largest i (smallest j)
        i_star = jnp.where(escore == s_star[:, None], i_vec, -1).max(axis=1)
        j_star = d - i_star
        c_star = (escore == s_star[:, None]).sum(axis=1, dtype=jnp.int32)
        better = (s_star > bS) | (
            (s_star == bS) & ((j_star < bJ) | ((j_star == bJ) & (i_star < bI))))
        equal = (s_star == bS)
        bC = jnp.where(better, c_star, jnp.where(equal, bC + c_star, bC))
        bS = jnp.where(better, s_star, bS)
        bJ = jnp.where(better, j_star, bJ)
        bI = jnp.where(better, i_star, bI)

        return (H_new, H1, D_new, I_new, chars, (bS, bJ, bI, bC)), dirs

    ds = jnp.arange(1, Lr + Lw + 1, dtype=jnp.int32)
    (_, _, _, _, _, best), dirs = jax.lax.scan(
        step, (h0, hm1, d0, i0, chars0, best0), ds)
    bS, bJ, bI, bC = best
    return bS, bI, bJ, bC, dirs


@jax.jit
def dp_traceback(
    dirs: jax.Array,     # (Lr+Lw, P, Lr+1) uint8 from dp_forward
    reads: jax.Array,    # (P, Lr) uint8
    rlens: jax.Array,    # (P,) int32
    wins: jax.Array,     # (P, Lw) uint8
    hit_i: jax.Array,    # (P,) int32 (1-based)
    hit_j: jax.Array,    # (P,) int32 (1-based)
    clip_l: jax.Array,   # (P,) int32
    active: jax.Array,   # (P,) bool — lanes worth tracing (score >= cutoff)
):
    """Walk the direction tensor backwards, emitting run-length ops.

    Returns (ops, counts, nruns, start_j): ops/counts are (P, MAXRUNS)
    in right-to-left order (first run is the right clip); start_j is
    the 0-based window offset where the alignment starts.
    """
    ND, P, Lr1 = dirs.shape
    Lr = reads.shape[1]
    Lw = wins.shape[1]
    MAXRUNS = Lr + Lw + 4
    flat_dirs = dirs.reshape(-1)
    pidx = jnp.arange(P, dtype=jnp.int32)

    ops = jnp.zeros((P, MAXRUNS), jnp.int32)
    cnts = jnp.zeros((P, MAXRUNS), jnp.int32)
    # initial right-clip run
    rclip = rlens - hit_i
    has_rclip = (rclip > 0) & active
    ops = ops.at[:, 0].set(jnp.where(has_rclip, OP_CLIP, OP_NONE))
    cnts = cnts.at[:, 0].set(jnp.where(has_rclip, rclip, 0))
    nrun = jnp.where(has_rclip, 1, 0)

    N, DCH, ICH = 0, 1, 2

    def emit(ops, cnts, nrun, op, count, do):
        """Append `count` of `op` to each active lane's run list."""
        last = ops[pidx, jnp.maximum(nrun - 1, 0)]
        same = (last == op) & (nrun > 0)
        idx = jnp.where(same, nrun - 1, nrun)
        newop = jnp.where(do, op, ops[pidx, idx])
        newcnt = jnp.where(do, jnp.where(same, cnts[pidx, idx] + count, count),
                           cnts[pidx, idx])
        ops = ops.at[pidx, idx].set(newop)
        cnts = cnts.at[pidx, idx].set(newcnt)
        nrun = jnp.where(do, jnp.where(same, nrun, nrun + 1), nrun)
        return ops, cnts, nrun

    def cond(c):
        i, j, state, done, *_ = c
        return jnp.any(~done & (i > 0) & (j > 0))

    def body(c):
        i, j, state, done, startj, clip, ops, cnts, nrun = c
        act = ~done & (i > 0) & (j > 0)
        d = i + j
        byte = flat_dirs[jnp.clip((d - 1) * P * Lr1 + pidx * Lr1 + i, 0, ND * P * Lr1 - 1)].astype(jnp.int32)
        dH = byte & 3
        dD = (byte >> 2) & 1
        dI = (byte >> 3) & 3
        rc = jnp.take_along_axis(reads, jnp.clip(i[:, None] - 1, 0, Lr - 1), axis=1)[:, 0]
        wc = jnp.take_along_axis(wins, jnp.clip(j[:, None] - 1, 0, Lw - 1), axis=1)[:, 0]
        is_match = rc == wc
        mop = jnp.where(is_match, OP_MATCH, OP_MISMATCH)

        do_diag = act & (state == N) & (dH == DH_DIAG)
        do_sm = act & (state == N) & (dH == DH_SM)
        do_d = act & ((state == DCH) | ((state == N) & (dH == DH_D)))
        do_i = act & ((state == ICH) | ((state == N) & (dH == DH_I)))
        i_fresh = do_i & (dI == DI_FRESH)

        op = jnp.where(do_diag | do_sm, mop,
                       jnp.where(do_d, OP_DEL, OP_INS))
        ops, cnts, nrun = emit(ops, cnts, nrun, op, 1, act)

        ni = jnp.where(do_diag | (do_i & ~i_fresh), i - 1, i)
        nj = jnp.where(do_diag | do_sm | do_d, j - 1, j)
        nstate = jnp.where(do_d, jnp.where(dD == DD_OPEN, N, DCH),
                           jnp.where(do_i & ~i_fresh,
                                     jnp.where(dI == DI_OPEN, N, ICH), N))
        exit_now = do_sm | i_fresh
        clip = jnp.where(exit_now, i - 1, clip)
        startj = jnp.where(do_sm, j - 1, jnp.where(i_fresh, j, startj))
        done = done | exit_now
        return ni, nj, nstate, done, startj, clip, ops, cnts, nrun

    i = jnp.where(active, hit_i, 0)
    j = jnp.where(active, hit_j, 0)
    state = jnp.zeros((P,), jnp.int32)
    done = ~active
    startj = jnp.zeros((P,), jnp.int32)
    clip = jnp.zeros((P,), jnp.int32)
    i, j, state, done, startj, clip, ops, cnts, nrun = jax.lax.while_loop(
        cond, body, (i, j, state, done, startj, clip, ops, cnts, nrun))

    # boundary exits
    at_j0 = active & ~done & (j == 0) & (i > 0)
    sc = jnp.minimum(clip_l, i)
    ops, cnts, nrun = emit(ops, cnts, nrun, OP_INS, i - sc, at_j0 & (i - sc > 0))
    clip = jnp.where(at_j0, sc, clip)
    startj = jnp.where(at_j0, 0, startj)
    at_i0 = active & ~done & (i == 0)
    startj = jnp.where(at_i0, j, startj)
    # left soft-clip run (SM/SI exits recorded `clip`; boundary j=0 uses sc)
    ops, cnts, nrun = emit(ops, cnts, nrun, OP_CLIP, clip, active & (clip > 0))
    return ops, cnts, nrun, startj
