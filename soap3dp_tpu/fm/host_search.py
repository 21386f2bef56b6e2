"""Host re-alignment of super-repetitive reads.

The rebuild's analog of the reference's host re-align of "super-bad"
reads (ProcessReadDoubleStrand2, CPUfunctions.cpp:555, invoked from
collect_all_answers CPUfunctions.cpp:1226): a read whose seeds stay
over the SA-interval budget even in the device's round-3 escalation
gets its <=k-mismatch placement set enumerated here, on the host,
against the same flat occ/bwt/mark/pac tables the device uses
(mmap'd, so this costs no extra resident memory).

Host work is bounded the same way the reference bounds it: the
per-read occurrence decode is clamped (``max_decode``, the analog of
MaxOutputPerRead/MaxHitsEachEndForPairing truncation at
CPUfunctions.cpp:1287-1299) and ``realign_flagged`` re-aligns at most
``budget`` reads per batch. On a uniform genome a handful of reads
land here per run; a repeat-structured genome can flag >5% of a batch
(centromeric satellite and microsatellite reads — some seed intervals
exceed 10^6 occurrences), and decoding those completely would cost
minutes of host time per batch. Beyond-cap reads keep their truncated
sets plus the ``flagged`` mark (surfaced in the run summary) and the
pair/single DP rescue engines — the reference's own route for
over-cap reads — recover their placements anchored on the mate.
SOAP3DP_HOST_REALIGN_FULL=1 restores unbounded complete enumeration;
``max_interval`` (a seed occurring more than ~a million times) still
guards even that.

Everything is vectorized numpy except the per-character backward-search
loop (segment length iterations of scalar interval updates).
"""

from __future__ import annotations

import numpy as np

from soap3dp_tpu.index.builder import Index, _popcount_u32

_LANES = np.uint32(0x5555_5555)


def _match_bits(words: np.ndarray, c) -> np.ndarray:
    """One bit per 2-bit base slot of each word equal to base c
    (the numpy mirror of fmindex._match_bits)."""
    x = words ^ (np.uint32(c) * _LANES)
    return (~(x | (x >> np.uint32(1)))) & _LANES


def occ_host(index: Index, c: int, ks: np.ndarray) -> np.ndarray:
    """Occ(c, k) for an array of k values — numpy mirror of
    fmindex.occ (2bwt-lib/BWT.c BWTOccValue semantics)."""
    ks = np.asarray(ks, np.uint32)
    kp = ks - (ks > np.uint32(index.primary)).astype(np.uint32)
    w = (kp >> 4).astype(np.int64)
    words = np.asarray(index.bwt)[w]
    base = np.asarray(index.occ)[4 * w + c]
    q = kp & np.uint32(15)
    qm = np.where(q == 0, np.uint32(0),
                  _LANES >> (2 * (16 - q)).astype(np.uint32))
    return base + _popcount_u32(_match_bits(words, c) & qm)


def backward_interval(index: Index, seg: np.ndarray) -> tuple[int, int]:
    """Exact backward-search SA interval of a code segment."""
    l = np.zeros(1, np.uint32)
    r = np.full(1, index.n + 1, np.uint32)
    counts = np.asarray(index.counts)
    for c in seg[::-1]:
        c = int(c)
        l = counts[c] + occ_host(index, c, l)
        r = counts[c] + occ_host(index, c, r)
        if l[0] >= r[0]:
            return 0, 0
    return int(l[0]), int(r[0])


def decode_rows(index: Index, rows: np.ndarray) -> np.ndarray:
    """Text positions of SA rows via the bounded LF walk — vectorized
    numpy mirror of fmindex.sa_decode (BWTSaValue, 2bwt-lib/BWT.c:1694)."""
    rows = np.asarray(rows, np.uint32).copy()
    sa_samples = np.asarray(index.sa_samples)
    if index.sa_rate == 1:
        return sa_samples[rows.astype(np.int64)]
    mark_words = np.asarray(index.mark_words)
    mark_rank = np.asarray(index.mark_rank)
    bwt = np.asarray(index.bwt)
    occ = np.asarray(index.occ)
    counts = np.asarray(index.counts)
    out = np.zeros(len(rows), np.uint32)
    done = np.zeros(len(rows), bool)
    for step in range(index.sa_rate):
        mw = (rows >> 5).astype(np.int64)
        words = mark_words[mw]
        bsel = rows & np.uint32(31)
        marked = ((words >> bsel) & 1).astype(bool)
        newly = marked & ~done
        if newly.any():
            below_mask = np.where(
                bsel == 0, np.uint32(0),
                np.uint32(0xFFFFFFFF) >> (np.uint32(32) - bsel))
            rank = mark_rank[mw] + _popcount_u32(words & below_mask)
            out[newly] = sa_samples[rank[newly].astype(np.int64)] + step
        done |= marked
        if done.all() or step == index.sa_rate - 1:
            break
        kp = rows - (rows > np.uint32(index.primary)).astype(np.uint32)
        w = (kp >> 4).astype(np.int64)
        bw = bwt[w]
        q = kp & np.uint32(15)
        c = (bw >> (2 * q)) & np.uint32(3)
        base = occ[4 * w + c.astype(np.int64)]
        qm = np.where(q == 0, np.uint32(0),
                      _LANES >> (2 * (16 - q)).astype(np.uint32))
        # per-element base c differs per row; _per_base_match handles it
        inword = _popcount_u32(_per_base_match(bw, c) & qm)
        lf = counts[c.astype(np.int64)] + base + inword
        rows = np.where(done, rows, lf.astype(np.uint32))
    return out


def _per_base_match(words: np.ndarray, c: np.ndarray) -> np.ndarray:
    """_match_bits with a per-element base array."""
    x = words ^ (c.astype(np.uint32) * _LANES)
    return (~(x | (x >> np.uint32(1)))) & _LANES


def genome_windows(index: Index, tps: np.ndarray, L: int) -> np.ndarray:
    """(M, L) genome codes at each tp — numpy mirror of
    fmindex.extract_genome."""
    pac = np.asarray(index.pac)
    tps = np.asarray(tps, np.int64)
    W = (L + 15) // 16 + 1
    w0 = tps >> 4
    j = np.arange(W, dtype=np.int64)[None, :]
    words = pac[np.clip(w0[:, None] + j, 0, len(pac) - 1)]
    sh = (2 * (tps & 15)).astype(np.uint32)[:, None]
    lo = words[:, :-1] >> sh
    hi = np.where(sh == 0, np.uint32(0),
                  words[:, 1:] << ((np.uint32(32) - sh) & np.uint32(31)))
    aligned = lo | hi
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    codes = (aligned[:, :, None] >> shifts) & np.uint32(3)
    return codes.reshape(len(tps), -1)[:, :L].astype(np.uint8)


def complete_search(
    index: Index,
    read: np.ndarray,      # (L,) uint8 forward codes
    length: int,
    k: int,
    max_interval: int = 1 << 20,
    max_decode: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """<=k-mismatch placements of one read, both strands.

    Returns (strand, tp, nmis, overflow): parallel arrays of every
    placement found, and whether any seed interval was skipped
    (``max_interval``) or truncated (``max_decode``) — in which case
    placements may be missing and the caller should keep the read
    flagged.

    ``max_decode`` bounds the total occurrences decoded per strand,
    truncating an over-budget interval to its first ``remaining``
    rows — exactly the reference host search's occurrence cap
    (CPUfunctions.cpp:1287-1299 clamps r to MaxOutputPerRead). With
    max_decode=None the enumeration is COMPLETE: the read is split
    into k+1 full pigeonhole segments; any <=k-mismatch placement
    contains at least one exact segment, so decoding EVERY occurrence
    of every segment and verifying yields the full set — the guarantee
    the reference's host SRA model provides via exhaustive
    mismatch-case enumeration (2bwt-flex/SRA2BWTMdl.c).
    """
    from soap3dp_tpu.utils import dna

    seq_f = np.asarray(read[:length], np.uint8)
    n = index.n
    S = k + 1
    out_strand: list[np.ndarray] = []
    out_tp: list[np.ndarray] = []
    out_nm: list[np.ndarray] = []
    overflow = False
    for strand, seq in ((0, seq_f), (1, dna.revcomp_codes(seq_f))):
        cand: list[np.ndarray] = []
        remaining = max_decode
        for s in range(S):
            st = s * length // S
            en = (s + 1) * length // S
            l, r = backward_interval(index, seq[st:en])
            width = r - l
            if width == 0:
                continue
            if width > max_interval:
                overflow = True
                continue
            take = width if remaining is None else min(width, remaining)
            if take < width:
                overflow = True
            if take == 0:
                continue
            if remaining is not None:
                remaining -= take
            pos = decode_rows(index, np.arange(l, l + take, dtype=np.uint32)
                              ).astype(np.int64) - st
            cand.append(pos[(pos >= 0) & (pos + length <= n)])
        if not cand:
            continue
        tps = np.unique(np.concatenate(cand))
        if tps.size == 0:
            continue
        g = genome_windows(index, tps, length)
        nm = (g != seq[None, :]).sum(axis=1).astype(np.int32)
        keep = nm <= k
        out_strand.append(np.full(int(keep.sum()), strand, np.int8))
        out_tp.append(tps[keep])
        out_nm.append(nm[keep])
    if not out_tp:
        z = np.zeros(0, np.int64)
        return z.astype(np.int8), z, z.astype(np.int32), overflow
    return (np.concatenate(out_strand), np.concatenate(out_tp),
            np.concatenate(out_nm).astype(np.int32), overflow)


def realign_flagged(index: Index, h, codes: np.ndarray, lens: np.ndarray,
                    k: int, max_interval: int = 1 << 20,
                    max_decode: int | None = None,
                    budget: int | None = None):
    """Replace still-flagged reads' truncated hit sets with
    host-enumerated ones; clears ``flagged`` except on
    max_interval/max_decode overflow. Returns a new HitArrays (host
    numpy).

    ``max_decode`` caps occurrences decoded per read per strand (the
    reference's MaxOutputPerRead / MaxHitsEachEndForPairing occurrence
    clamp, CPUfunctions.cpp:1287-1299 + soap3-dp.ini defaults
    1000/8000); None = complete enumeration. ``budget`` caps how many
    reads are re-aligned per call — a repeat-dense genome can flag
    >5% of a batch (satellite/microsatellite storms) and unbounded
    host work would dominate the pipeline; reads beyond the budget
    keep their device-truncated hit sets and stay flagged, and the
    pair DP-rescue engines (anchored on the mate, the reference's own
    route for over-cap reads) recover their placements. Env
    SOAP3DP_HOST_REALIGN_FULL=1 restores the round-3 uncapped
    behavior."""
    import os
    import sys

    from soap3dp_tpu.fm.search import HitArrays

    flagged = np.asarray(h.flagged)
    if not flagged.any() or os.environ.get("SOAP3DP_NO_HOST_REALIGN"):
        return h
    if os.environ.get("SOAP3DP_HOST_REALIGN_FULL"):
        max_decode = None
        budget = None
    sel = np.flatnonzero(flagged)
    skipped = 0
    if budget is not None and len(sel) > budget:
        skipped = len(sel) - budget
        sel = sel[:budget]
    row, tp, nm, va, _ = h.to_host()
    B = len(flagged)
    read_of = np.where(row >= B, row - B, row)
    keep = va.copy()
    keep[va] = ~np.isin(read_of[va], sel)

    new_rows: list[np.ndarray] = []
    new_tp: list[np.ndarray] = []
    new_nm: list[np.ndarray] = []
    still = flagged.copy()
    for b in sel:
        strand, tps, nms, over = complete_search(
            index, np.asarray(codes[b]), int(lens[b]), k, max_interval,
            max_decode)
        still[b] = over
        new_rows.append(b + strand.astype(np.int64) * B)
        new_tp.append(tps)
        new_nm.append(nms)
    print(f"[soap3dp] host re-align: {len(sel)} super-repetitive read(s) "
          f"re-aligned on host"
          + (f" (occ cap {max_decode}/strand)" if max_decode else "")
          + (f"; {int(still[sel].sum())} truncated at the cap"
             if still[sel].any() else "")
          + (f"; {skipped} beyond the {budget}-read batch budget kept "
             "their device hit sets" if skipped else ""),
          file=sys.stderr)
    return HitArrays(
        row=np.concatenate([row[keep]] + new_rows).astype(np.int32),
        tp=np.concatenate([tp[keep].astype(np.uint32)]
                          + [t.astype(np.uint32) for t in new_tp]),
        nmis=np.concatenate([nm[keep]] + new_nm).astype(np.int32),
        valid=np.ones(int(keep.sum()) + sum(len(t) for t in new_tp), bool),
        flagged=still)
