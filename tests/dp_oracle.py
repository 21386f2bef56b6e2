"""Scalar-semantics oracle for the semi-global affine-gap DP.

Encodes the exact recurrence, clipping/anchor rules, tie-break
priorities and traceback state machine of the reference DP kernels
(DPScoreNHitPos / GenerateDPTable / GPUBacktrack,
DV-DPfunctions.cu:61-512), re-derived from their behavior:

* score[j][i]: best score with read[1..i] and window[1..j] consumed
  (1-based), alignment start free in the window (init row 0 while
  j < anchorLeft), left soft-clip of up to clipL read chars free,
  right soft-clip via taking the max over i >= Lr - clipR.
* affine gaps: a gap of length g costs open + (g-1)*ext.
* best cell: highest score; ties broken by smallest j, then smallest i
  (the reference's loop order).
* traceback priority: diag > D-open > D-ext > clip-SM > clip-SI >
  I-open > I-ext, with gap chains preferring to close (open) on ties.

The JAX wavefront engine must match this oracle exactly.
"""

from __future__ import annotations

import numpy as np

NEG = -32000  # DP_SCORE_NEG_INFINITY (DV-DPfunctions.cu:52)


def clamp(x):
    return max(x, NEG)


def oracle_forward(read, win, clipL, clipR, anchorL, anchorR, scores):
    """Returns (H, Dt, best=(score, j, i), count)."""
    m, mm, go, ge = scores
    gi = go - ge
    Lr, Lw = len(read), len(win)
    H = np.zeros((Lw + 1, Lr + 1), dtype=np.int64)
    Dt = np.zeros_like(H)
    H[0, 0] = 0
    Dt[0, 0] = clamp(gi)
    up = gi
    for i in range(1, Lr + 1):
        if i <= clipL:
            H[0, i] = clamp(go)
            Dt[0, i] = clamp(go + gi)
        else:
            up += ge
            H[0, i] = clamp(up)
            Dt[0, i] = clamp(up + gi)
    best = (NEG, 0, 0)
    cnt = 0
    for j in range(1, Lw + 1):
        init = 0 if j < anchorL else NEG
        pinit = 0 if j - 1 < anchorL else NEG
        ch = win[j - 1]
        upv = init
        irun = init + gi
        pup = pinit
        H[j, 0] = clamp(init)
        Dt[j, 0] = clamp(irun)
        for i in range(1, Lr + 1):
            prev_r = H[j - 1, i]
            dv = max(go + prev_r, ge + Dt[j - 1, i])
            Dt[j, i] = clamp(dv)
            irun = max(ge + irun, go + upv)
            g2 = max(irun, dv)
            diag = pup + (m if ch == read[i - 1] else mm)
            upv = max(g2, diag)
            H[j, i] = clamp(upv)
            pup = prev_r
            if i <= clipL:
                irun = max(init + gi, irun)
                pup = max(pinit, pup)
            if i >= Lr - clipR and j >= anchorR:
                if upv > best[0]:
                    best = (upv, j, i)
                    cnt = 1
                elif upv == best[0]:
                    cnt += 1
    return H, Dt, best, cnt


def oracle_traceback(read, win, H, Dt, best, clipL, anchorL, scores):
    """Returns (pattern, start_j) where pattern is a right-to-left list of
    'M'/'m'/'I'/'D' plus ('S', n) clip runs, and start_j is the 0-based
    window offset of the alignment start."""
    m, mm, go, ge = scores
    _, hit_j, hit_i = best
    Lr = len(read)
    pat = []
    if Lr - hit_i > 0:
        pat.append(("S", Lr - hit_i))
    i, j = hit_i, hit_j
    s = H[j, i]
    state = "N"
    exit_state = None

    def init(jj):
        return 0 if jj < anchorL else NEG

    while i > 0 and j > 0:
        ch, rc = win[j - 1], read[i - 1]
        d = m if ch == rc else mm
        if state == "N":
            if s == d + H[j - 1, i - 1]:
                pat.append("M" if ch == rc else "m")
                s = H[j - 1, i - 1]
                i -= 1
                j -= 1
            elif s == go + H[j - 1, i]:
                pat.append("D")
                s = H[j - 1, i]
                j -= 1
            elif s == ge + Dt[j - 1, i]:
                pat.append("D")
                s = Dt[j - 1, i]
                j -= 1
                state = "D"
            elif i <= clipL + 1 and s == init(j - 1) + d:
                pat.append("M" if ch == rc else "m")
                j -= 1
                exit_state = "SM"
                break
            elif i <= clipL + 1 and s == init(j) + go:
                pat.append("I")
                exit_state = "SI"
                break
            elif s == go + H[j, i - 1]:
                pat.append("I")
                s = H[j, i - 1]
                i -= 1
            else:
                pat.append("I")
                s = s - ge
                i -= 1
                state = "I"
        elif state == "D":
            pat.append("D")
            j -= 1
            if s == go + H[j, i]:
                state = "N"
                s = H[j, i]
            else:
                s = s - ge
        else:  # state == "I"
            if i <= clipL + 1 and s == init(j) + go:
                pat.append("I")
                exit_state = "SI"
                break
            pat.append("I")
            i -= 1
            if s == go + H[j, i]:
                state = "N"
                s = H[j, i]
            else:
                s = s - ge
    if exit_state in ("SM", "SI"):
        pat.append(("S", i - 1))
    elif j == 0 and i > 0:
        sc = min(clipL, i)
        if sc < i:
            pat.append(("I", i - sc))
        pat.append(("S", sc))
    return pat, j


def pattern_to_cigar(pat):
    """Right-to-left pattern -> (cigar string, NM-ish mismatch+gap count)."""
    runs = []
    for p in reversed(pat):
        if isinstance(p, tuple):
            op, n = p
            if op == "S" and n == 0:
                continue
            op = "S" if op == "S" else "I"
        else:
            op, n = ("M" if p in ("M", "m") else p), 1
        if runs and runs[-1][0] == op:
            runs[-1][1] += n
        else:
            runs.append([op, n])
    return "".join(f"{n}{op}" for op, n in runs)


def score_of_pattern(pat, scores):
    """Recompute the alignment score from a pattern (clips are free)."""
    m, mm, go, ge = scores
    total = 0
    gap = None
    for p in pat:
        if isinstance(p, tuple):
            gap = None
            continue
        if p in ("M", "m"):
            total += m if p == "M" else mm
            gap = None
        elif p in ("I", "D"):
            total += ge + (go - ge if gap != p else 0)
            gap = p
    return total
