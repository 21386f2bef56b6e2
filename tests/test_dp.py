"""Wavefront DP engine vs the scalar-semantics oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from soap3dp_tpu.kernels import banded_dp
from soap3dp_tpu.kernels.banded_dp import DPScores, dp_forward, dp_traceback
from tests import dp_oracle

SC = DPScores()
SCORES = (SC.match, SC.mismatch, SC.gap_open, SC.gap_ext)

OPCH = {banded_dp.OP_MATCH: "M", banded_dp.OP_MISMATCH: "m",
        banded_dp.OP_INS: "I", banded_dp.OP_DEL: "D", banded_dp.OP_CLIP: "S"}


def runs_from_oracle(pat):
    runs = []
    for p in pat:
        op, n = (p if isinstance(p, tuple) else (p, 1))
        if n == 0:
            continue
        if runs and runs[-1][0] == op:
            runs[-1][1] += n
        else:
            runs.append([op, n])
    return [(o, n) for o, n in runs]


def runs_from_engine(ops, cnts, nrun, p):
    return [(OPCH[int(ops[p, r])], int(cnts[p, r])) for r in range(int(nrun[p]))
            if int(cnts[p, r]) > 0]


def mutate(rng, seq, nsub, nins, ndel):
    out = list(seq)
    for _ in range(ndel):
        if len(out) > 4:
            del out[rng.integers(0, len(out))]
    for _ in range(nins):
        out.insert(rng.integers(0, len(out) + 1), rng.integers(0, 4))
    for _ in range(nsub):
        p = rng.integers(0, len(out))
        out[p] = (out[p] + rng.integers(1, 4)) % 4
    return np.asarray(out, dtype=np.uint8)


def make_problems(rng, P, Lr, Lw, with_anchor=False):
    wins = rng.integers(0, 4, size=(P, Lw)).astype(np.uint8)
    reads = np.zeros((P, Lr), dtype=np.uint8)
    rlens = np.zeros(P, dtype=np.int32)
    for p in range(P):
        off = rng.integers(0, Lw // 3)
        span = rng.integers(Lr // 2, Lr)
        piece = mutate(rng, wins[p, off:off + span],
                       rng.integers(0, 4), rng.integers(0, 3), rng.integers(0, 3))
        piece = piece[:Lr]
        reads[p, :len(piece)] = piece
        rlens[p] = len(piece)
    clip_l = rng.integers(0, 6, size=P).astype(np.int32)
    clip_r = rng.integers(0, 6, size=P).astype(np.int32)
    if with_anchor:
        anchor_l = rng.integers(2, Lw, size=P).astype(np.int32)
        anchor_r = rng.integers(0, Lw // 2, size=P).astype(np.int32)
    else:
        anchor_l = np.full(P, Lw + 1, dtype=np.int32)
        anchor_r = np.zeros(P, dtype=np.int32)
    wlens = np.full(P, Lw, dtype=np.int32)
    return reads, rlens, wins, wlens, clip_l, clip_r, anchor_l, anchor_r


@pytest.mark.parametrize("with_anchor", [False, True])
def test_forward_matches_oracle(rng, with_anchor):
    P, Lr, Lw = 32, 24, 48
    prob = make_problems(rng, P, Lr, Lw, with_anchor)
    reads, rlens, wins, wlens, cl, cr, al, ar = prob
    bS, bI, bJ, bC, _ = dp_forward(*[jnp.asarray(x) for x in prob], sc=SC)
    bS, bI, bJ, bC = map(np.asarray, (bS, bI, bJ, bC))
    for p in range(P):
        H, Dt, best, cnt = dp_oracle.oracle_forward(
            reads[p, :rlens[p]], wins[p], cl[p], cr[p], al[p], ar[p], SCORES)
        assert bS[p] == best[0], p
        assert (bJ[p], bI[p]) == (best[1], best[2]), p
        assert bC[p] == cnt, p


@pytest.mark.parametrize("with_anchor", [False, True])
def test_traceback_matches_oracle(rng, with_anchor):
    P, Lr, Lw = 32, 24, 48
    prob = make_problems(rng, P, Lr, Lw, with_anchor)
    reads, rlens, wins, wlens, cl, cr, al, ar = prob
    jprob = [jnp.asarray(x) for x in prob]
    bS, bI, bJ, bC, dirs = dp_forward(*jprob, sc=SC)
    active = np.asarray(bS) >= 1  # only meaningful alignments
    ops, cnts, nrun, startj = dp_traceback(
        dirs, jprob[0], jprob[1], jprob[2], bI, bJ, jprob[4],
        jnp.asarray(active))
    ops, cnts, nrun, startj = map(np.asarray, (ops, cnts, nrun, startj))
    checked = 0
    for p in range(P):
        if not active[p]:
            continue
        H, Dt, best, cnt = dp_oracle.oracle_forward(
            reads[p, :rlens[p]], wins[p], cl[p], cr[p], al[p], ar[p], SCORES)
        pat, sj = dp_oracle.oracle_traceback(
            reads[p, :rlens[p]], wins[p], H, Dt, best, cl[p], al[p], SCORES)
        assert runs_from_engine(ops, cnts, nrun, p) == runs_from_oracle(pat), p
        assert startj[p] == sj, p
        # pattern must reproduce the score (clips free)
        assert dp_oracle.score_of_pattern(pat, SCORES) == best[0], p
        checked += 1
    assert checked > P // 2


def test_exact_read_aligns_perfectly(rng):
    """A read copied verbatim from the window: all-match, full score."""
    P, Lr, Lw = 8, 20, 40
    wins = rng.integers(0, 4, size=(P, Lw)).astype(np.uint8)
    reads = wins[:, 5:5 + Lr].copy()
    args = (jnp.asarray(reads), jnp.full(P, Lr, jnp.int32), jnp.asarray(wins),
            jnp.full(P, Lw, jnp.int32), jnp.zeros(P, jnp.int32),
            jnp.zeros(P, jnp.int32), jnp.full(P, Lw + 1, jnp.int32),
            jnp.zeros(P, jnp.int32))
    bS, bI, bJ, bC, dirs = dp_forward(*args, sc=SC)
    assert np.all(np.asarray(bS) == Lr)
    assert np.all(np.asarray(bI) == Lr)
    ops, cnts, nrun, startj = dp_traceback(
        dirs, args[0], args[1], args[2], bI, bJ, args[4],
        jnp.ones(P, bool))
    assert np.all(np.asarray(startj) == 5)
    for p in range(P):
        assert runs_from_engine(np.asarray(ops), np.asarray(cnts),
                                np.asarray(nrun), p) == [("M", Lr)]


@pytest.mark.parametrize("with_anchor", [False, True])
def test_fused_align_matches_scan_path(with_anchor):
    """The fused forward+traceback kernel (interpret mode) must produce
    byte-identical runs/stats to the scan + host-RLE reference path."""
    from soap3dp_tpu.kernels import banded_dp as bd

    rng = np.random.default_rng(9)
    P, Lr, Lw = 64, 40, 70
    prob = make_problems(rng, P, Lr, Lw, with_anchor)
    reads, rlens, wins, wlens, cl, cr, al, ar = prob
    jprob = [jnp.asarray(x) for x in prob]
    cutoff = np.full(P, 10, np.int32)

    # reference: scan forward + scan traceback + host RLE
    bS, bI, bJ, bC, dirs = bd._dp_forward_scan(*jprob, sc=SC)
    sS, sI, sJ, sC = map(np.asarray, (bS, bI, bJ, bC))
    active = sS >= cutoff
    r_ops, r_cnts, r_nrun, r_startj = bd.dp_traceback(
        dirs, jprob[0], jprob[1], jprob[2], bI, bJ, jprob[4],
        jnp.asarray(active))

    # fused kernel in interpret mode
    mr = max(bd.MAX_RUNS, bd._max_runs_bound(Lr))
    stats, runs = bd._dp_align_pallas_call(
        *jprob, jnp.asarray(cutoff), SC, pt=bd.PALLAS_P_TILE, mr=mr,
        interpret=True)
    stats, runs = np.asarray(stats), np.asarray(runs)
    f_ops, f_cnts = runs >> 12, runs & 0xFFF

    assert np.array_equal(stats[:, 0], sS)
    assert np.array_equal(stats[:, 1], sI)
    assert np.array_equal(stats[:, 2], sJ)
    assert np.array_equal(stats[:, 3], sC)
    assert not stats[:, 6].any(), "run budget overflow"
    checked = 0
    for p in range(P):
        if not active[p]:
            assert stats[p, 5] == 0
            continue
        assert stats[p, 4] == r_startj[p], p
        want = [(int(r_ops[p, r]), int(r_cnts[p, r]))
                for r in range(int(r_nrun[p])) if r_cnts[p, r] > 0]
        got = [(int(f_ops[p, r]), int(f_cnts[p, r]))
               for r in range(int(stats[p, 5])) if f_cnts[p, r] > 0]
        assert got == want, p
        checked += 1
    assert checked > P // 2


def test_pallas_forward_matches_scan():
    """The Pallas VMEM kernel must agree exactly with the scan spec
    (run in interpreter mode so the test works on CPU)."""
    import numpy as np
    from soap3dp_tpu.kernels import banded_dp as bd

    rng = np.random.default_rng(3)
    P, Lr, Lw = 64, 40, 70
    wins = rng.integers(0, 4, (P, Lw)).astype(np.uint8)
    reads = np.zeros((P, Lr), np.uint8)
    rlens = rng.integers(20, Lr + 1, P).astype(np.int32)
    for p in range(P):
        reads[p, :rlens[p]] = wins[p, 5:5 + rlens[p]]
    # mutations + an indel case
    reads[0, 10] = (reads[0, 10] + 1) % 4
    reads[1] = np.roll(reads[1], 3)
    wlens = np.full(P, Lw, np.int32)
    clip_l = rng.integers(0, 10, P).astype(np.int32)
    clip_r = rng.integers(0, 10, P).astype(np.int32)
    anchor_l = np.full(P, Lw + 1, np.int32)
    anchor_r = np.zeros(P, np.int32)
    args = [jnp.asarray(x) for x in (reads, rlens, wins, wlens, clip_l,
                                     clip_r, anchor_l, anchor_r)]
    ref = bd._dp_forward_scan(*args, sc=bd.DPScores())
    got = bd._dp_forward_pallas_call(*args, sc=bd.DPScores(), interpret=True)
    for name, a, b in zip(("bS", "bI", "bJ", "bC"), ref[:4], got[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    # pallas dirs are padded to 128 lanes; the real lanes must agree
    assert np.array_equal(np.asarray(ref[4]),
                          np.asarray(got[4])[:, :, : Lr + 1]), "dirs"


def test_fused_align_long_reads_matches_scan():
    """Fused kernel with 256-lane state (reads up to 255bp) must match
    the scan path (VMEM budget permitting, long reads no longer fall
    off the Pallas path)."""
    from soap3dp_tpu.kernels import banded_dp as bd

    rng = np.random.default_rng(17)
    P, Lr, Lw = 64, 200, 300
    wins = rng.integers(0, 4, (P, Lw)).astype(np.uint8)
    reads = np.zeros((P, Lr), np.uint8)
    rlens = rng.integers(150, Lr + 1, P).astype(np.int32)
    for p in range(P):
        reads[p, :rlens[p]] = wins[p, 20:20 + rlens[p]]
    reads[0, 60] = (reads[0, 60] + 1) % 4
    reads[1, 30:180] = np.roll(reads[1, 30:180], 2)  # indel-ish
    args = [jnp.asarray(x) for x in (
        reads, rlens, wins, np.full(P, Lw, np.int32),
        rng.integers(0, 20, P).astype(np.int32),
        rng.integers(0, 20, P).astype(np.int32),
        np.full(P, Lw + 1, np.int32), np.zeros(P, np.int32))]
    cutoff = np.full(P, 45, np.int32)  # 0.3 * min read length

    bS, bI, bJ, bC, dirs = bd._dp_forward_scan(*args, sc=SC)
    sS = np.asarray(bS)
    active = sS >= cutoff
    r_ops, r_cnts, r_nrun, r_startj = bd.dp_traceback(
        dirs, args[0], args[1], args[2], bI, bJ, args[4],
        jnp.asarray(active))

    mr = max(bd.MAX_RUNS, bd._max_runs_bound(Lr))
    pt, q0 = bd._fused_tile(Lr + Lw, 256)
    assert q0 == 0
    stats, runs = bd._dp_align_pallas_call(
        *args, jnp.asarray(cutoff), SC, pt=pt, mr=mr, interpret=True)
    stats, runs = np.asarray(stats), np.asarray(runs)
    assert np.array_equal(stats[:, 0], sS)
    assert not stats[:, 6].any()
    checked = 0
    for p in range(P):
        if not active[p]:
            continue
        want = [(int(r_ops[p, r]), int(r_cnts[p, r]))
                for r in range(int(r_nrun[p])) if r_cnts[p, r] > 0]
        got = [(int(runs[p, r]) >> 12, int(runs[p, r]) & 0xFFF)
               for r in range(int(stats[p, 5])) if runs[p, r] & 0xFFF]
        assert got == want, p
        assert stats[p, 4] == r_startj[p], p
        checked += 1
    assert checked > P // 2


def test_fused_align_512bp_matches_scan():
    """512bp reads on the FAST path: the packed-int32 dirs scratch fits
    the VMEM budget at a small problem tile (VERDICT r3 item 7; the
    reference's MAX_READ_LENGTH is 1024, definitions.h:38)."""
    from soap3dp_tpu.kernels import banded_dp as bd

    rng = np.random.default_rng(23)
    P, Lr, Lw = 16, 512, 576
    wins = rng.integers(0, 4, (P, Lw)).astype(np.uint8)
    reads = np.zeros((P, Lr), np.uint8)
    rlens = rng.integers(480, Lr + 1, P).astype(np.int32)
    for p in range(P):
        reads[p, :rlens[p]] = wins[p, 20:20 + rlens[p]]
    reads[0, 100] = (reads[0, 100] + 1) % 4
    reads[1, 50:400] = np.roll(reads[1, 50:400], 3)  # indel-ish
    reads[2] = rng.integers(0, 4, Lr)                # garbage, below cutoff
    args = [jnp.asarray(x) for x in (
        reads, rlens, wins, np.full(P, Lw, np.int32),
        rng.integers(0, 30, P).astype(np.int32),
        rng.integers(0, 30, P).astype(np.int32),
        np.full(P, Lw + 1, np.int32), np.zeros(P, np.int32))]
    cutoff = np.full(P, 144, np.int32)  # 0.3 * min read length

    bS, bI, bJ, bC, dirs = bd._dp_forward_scan(*args, sc=SC)
    sS = np.asarray(bS)
    active = sS >= cutoff
    r_ops, r_cnts, r_nrun, r_startj = bd.dp_traceback(
        dirs, args[0], args[1], args[2], bI, bJ, args[4],
        jnp.asarray(active))

    mr = max(bd.MAX_RUNS, bd._max_runs_bound(Lr))
    pt, q0 = bd._fused_tile(Lr + Lw, 640)
    assert P % pt == 0 and q0 == 0, (pt, q0)  # 512bp fits in one pass
    stats, runs = bd._dp_align_pallas_call(
        *args, jnp.asarray(cutoff), SC, pt=pt, mr=mr, interpret=True)
    stats, runs = np.asarray(stats), np.asarray(runs)
    assert np.array_equal(stats[:, 0], sS)
    assert not stats[:, 6].any()
    checked = 0
    for p in range(P):
        if not active[p]:
            continue
        want = [(int(r_ops[p, r]), int(r_cnts[p, r]))
                for r in range(int(r_nrun[p])) if r_cnts[p, r] > 0]
        got = [(int(runs[p, r]) >> 12, int(runs[p, r]) & 0xFFF)
               for r in range(int(stats[p, 5])) if runs[p, r] & 0xFFF]
        assert got == want, p
        assert stats[p, 4] == r_startj[p], p
        checked += 1
    assert checked >= P - 2


def test_fused_align_1024bp_two_pass_matches_scan():
    """1024bp reads on the fused path via TWO-PASS traceback: the dirs
    scratch holds only the last (nd4 - q0) quad-words; the kernel
    re-runs the first q0 quads forward mid-traceback (VERDICT r4 item
    8; reference MAX_READ_LENGTH=1024, definitions.h:38)."""
    from soap3dp_tpu.kernels import banded_dp as bd

    rng = np.random.default_rng(31)
    P, Lr, Lw = 8, 1024, 1100
    wins = rng.integers(0, 4, (P, Lw)).astype(np.uint8)
    reads = np.zeros((P, Lr), np.uint8)
    rlens = rng.integers(990, Lr + 1, P).astype(np.int32)
    for p in range(P):
        reads[p, :rlens[p]] = wins[p, 30:30 + rlens[p]]
    reads[0, 200] = (reads[0, 200] + 1) % 4
    reads[1, 100:900] = np.roll(reads[1, 100:900], 4)  # indel-ish
    reads[2] = rng.integers(0, 4, Lr)                  # garbage, below cutoff
    args = [jnp.asarray(x) for x in (
        reads, rlens, wins, np.full(P, Lw, np.int32),
        rng.integers(0, 40, P).astype(np.int32),
        rng.integers(0, 40, P).astype(np.int32),
        np.full(P, Lw + 1, np.int32), np.zeros(P, np.int32))]
    cutoff = np.full(P, 297, np.int32)  # 0.3 * min read length

    bS, bI, bJ, bC, dirs = bd._dp_forward_scan(*args, sc=SC)
    sS = np.asarray(bS)
    active = sS >= cutoff
    r_ops, r_cnts, r_nrun, r_startj = bd.dp_traceback(
        dirs, args[0], args[1], args[2], bI, bJ, args[4],
        jnp.asarray(active))

    mr = max(bd.MAX_RUNS, bd._max_runs_bound(Lr))
    tile = bd._fused_tile(Lr + Lw, 1152)
    assert tile is not None, "1024bp must stay on the fused path"
    pt, q0 = tile
    assert q0 > 0, "1024bp must exercise the two-pass scheme"
    stats, runs = bd._dp_align_pallas_call(
        *args, jnp.asarray(cutoff), SC, pt=pt, mr=mr, q0=q0,
        interpret=True)
    stats, runs = np.asarray(stats), np.asarray(runs)
    assert np.array_equal(stats[:, 0], sS)
    assert not stats[:, 6].any()
    checked = 0
    for p in range(P):
        if not active[p]:
            continue
        want = [(int(r_ops[p, r]), int(r_cnts[p, r]))
                for r in range(int(r_nrun[p])) if r_cnts[p, r] > 0]
        got = [(int(runs[p, r]) >> 12, int(runs[p, r]) & 0xFFF)
               for r in range(int(stats[p, 5])) if runs[p, r] & 0xFFF]
        assert got == want, p
        assert stats[p, 4] == r_startj[p], p
        checked += 1
    assert checked >= P - 1
