"""Microbenchmark the SAM block-write path component by component.

Simulates the pair.py fast-path block shape (interleaved PE records,
100bp, S-array names) and times each stage of
SamWriter.write_block -> sam_native.format_block -> file write, so the
per-record tax (BENCH sam_out vs succinct) can be attributed.

    python tools/profile_sam_block.py [n_records]
"""

from __future__ import annotations

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:34s} {best * 1e3:8.1f} ms  "
          f"({best / N * 1e9:7.0f} ns/rec)")
    return out


N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
L = 100

rng = np.random.default_rng(0)
names = np.array([b"sim_%07d/%d" % (i // 2, i % 2 + 1) for i in range(N)])
flags = rng.integers(0, 2, N).astype(np.int64) * 16 + 99
chroms = np.zeros(N, np.int64)
poss = rng.integers(0, 40_000_000, N).astype(np.int64)
mapqs = np.full(N, 40, np.int64)
lens = np.full(N, L, np.int64)
cigars = np.char.add(lens.astype("S11"), b"M")
mate_chroms = chroms
mate_poss = poss + 300
tlens = np.full(N, 400, np.int64)
seq_codes = rng.integers(0, 4, (N, L), np.uint8)
quals = np.full((N, L), 35, np.uint8)
tags = (np.ones(N, np.int64), np.zeros(N, np.int64), np.zeros(N, np.int64))


class FakeIndex:
    names = ["synth1"]
    offsets = np.asarray([0, 40_000_000], np.uint64)


from soap3dp_tpu.io import sam, sam_native

print(f"N={N} records, native={sam_native.available()}")

# component timings inside format_block
print("[components]")
timeit("concat names (S-array)", lambda: sam_native._concat_with_offsets(names))
timeit("build cigars (np.char.add)",
       lambda: np.char.add(lens.astype("S11"), b"M"))
timeit("concat cigars", lambda: sam_native._concat_with_offsets(cigars))
timeit("i64 conversions x9",
       lambda: [np.ascontiguousarray(np.asarray(a), np.int64)
                for a in (flags, chroms, poss, mapqs, mate_chroms,
                          mate_poss, tlens, lens, tags[0])])

rname_buf = np.frombuffer(b"synth1", np.uint8)
rname_off = np.asarray([0, 6], np.int64)


def full_format():
    return sam_native.format_block(
        names, flags, rname_buf, rname_off, chroms, poss, mapqs, cigars,
        mate_chroms, mate_poss, tlens, seq_codes, lens, quals, tags)


text = timeit("format_block total", full_format)

# new hot-path form: gapless cigars + two-source seq (no interleave)
codes1 = np.ascontiguousarray(seq_codes[0::2])
codes2 = np.ascontiguousarray(seq_codes[1::2])
quals1 = np.ascontiguousarray(quals[0::2])
quals2 = np.ascontiguousarray(quals[1::2])
src = np.empty(N, np.int64)
src[0::2] = np.arange(N // 2)
src[1::2] = ~np.arange(N // 2)


def fast_format():
    return sam_native.format_block(
        names, flags, rname_buf, rname_off, chroms, poss, mapqs, None,
        mate_chroms, mate_poss, tlens, (codes1, codes2), lens,
        (quals1, quals2), tags, seq_src=src)


t2 = timeit("format_block gapless+2src", fast_format)
assert bytes(t2) == bytes(text), "hot-path form output differs!"
print(f"  output bytes: {len(text) / 1e6:.1f} MB "
      f"({len(text) / N:.0f} B/rec)")

# write_block end-to-end into a null sink
sink = open(os.devnull, "wb")
w = sam.SamWriter(sink, FakeIndex())
timeit("write_block e2e (devnull)",
       lambda: w.write_block(names, flags, chroms, poss, mapqs, cigars,
                             np.zeros(N, np.int32), mate_chroms=mate_chroms,
                             mate_poss=mate_poss, tlens=tlens,
                             seq_codes=seq_codes, seq_lens=lens, quals=quals,
                             tags=tags))

# tmpfs file write cost of the formatted text
path = "/tmp/prof_sam_out.sam"
fh = open(path, "wb")
timeit("raw fh.write(text)", lambda: fh.write(text), reps=3)
fh.close()
os.unlink(path)

# main-thread prep analog (pair.py fast path): interleave + pad
fi = np.arange(N // 2)


def prep():
    n1a = names[0::2]
    n2a = names[1::2]
    W = max(n1a.dtype.itemsize, n2a.dtype.itemsize)
    nm = np.empty(N, f"S{W}")
    nm[0::2] = n1a
    nm[1::2] = n2a
    sc_ = np.zeros((N, L), np.uint8)
    sc_[0::2] = seq_codes[0::2]
    sc_[1::2] = seq_codes[1::2]
    qm = np.zeros((N, L), np.uint8)
    qm[0::2] = quals[0::2]
    qm[1::2] = quals[1::2]
    return nm, sc_, qm


timeit("main-thread prep (interleave)", prep)
