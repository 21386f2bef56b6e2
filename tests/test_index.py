"""Index construction tests against brute-force oracles."""

import numpy as np
import pytest

from soap3dp_tpu.index.builder import build_index, load_index, save_index
from soap3dp_tpu.index.suffix_array import bwt_from_sa, suffix_array
from soap3dp_tpu.utils import dna
from tests.conftest import make_genome


def brute_suffix_array(codes: np.ndarray) -> np.ndarray:
    n = len(codes)
    suffixes = [bytes(codes[i:].tolist()) for i in range(n)] + [b""]
    # sentinel: shorter prefix sorts first, which bytes comparison gives.
    order = sorted(range(n + 1), key=lambda i: bytes(codes[i:].tolist()))
    return np.asarray(order, dtype=np.uint32)


def test_pack_unpack_roundtrip(rng):
    codes = rng.integers(0, 4, size=1000).astype(np.uint8)
    words = dna.pack_codes(codes)
    assert np.array_equal(dna.unpack_words(words, 1000), codes)


def test_revcomp():
    codes = dna.encode(b"ACGTN")
    assert dna.decode(codes) == b"ACGTG"  # N -> G
    assert dna.decode(dna.revcomp_codes(codes)) == b"CACGT"


@pytest.mark.parametrize("n", [1, 2, 17, 100, 1000])
def test_suffix_array_matches_bruteforce(rng, n):
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    assert np.array_equal(suffix_array(codes), brute_suffix_array(codes))


@pytest.mark.parametrize("text", ["random", "repeats"])
def test_native_sais_all_index_widths(rng, text):
    """Every native SA-IS template (uint32 production path, int32
    convert path, int64 hypothetical->4Gbp path) produces the same
    suffix array, verified against direct suffix comparison.

    ``repeats`` stresses satellite-like text (tandem 171-mers + STR
    runs) where LMS naming hits long equal substrings.
    """
    import ctypes

    from soap3dp_tpu.index import sais_native

    if not sais_native.available():
        pytest.skip("no native compiler")
    if text == "random":
        codes = rng.integers(0, 4, size=50_000).astype(np.uint8)
    else:
        mono = rng.integers(0, 4, size=171).astype(np.uint8)
        sat = np.tile(mono, 120)
        strs = np.tile(rng.integers(0, 4, size=3).astype(np.uint8), 2000)
        rnd = rng.integers(0, 4, size=20_000).astype(np.uint8)
        codes = np.concatenate([rnd[:7000], sat, strs, rnd[7000:], sat])
    # production path: uint32 template
    expect = sais_native.suffix_array_sais(codes)
    n = len(codes)
    assert expect.dtype == np.uint32 and expect[0] == n
    # spot-check suffix order at random rows against direct comparison
    rows = rng.integers(1, n, size=200)
    for r in rows:
        a, b = int(expect[r]), int(expect[r + 1]) if r + 1 <= n else None
        if b is None:
            continue
        sa_, sb_ = codes[a:].tobytes(), codes[b:].tobytes()
        assert sa_ < sb_ or (sa_ == sb_ and len(sa_) < len(sb_))
    lib = sais_native._load()
    # int32 convert path (sais_u8 below the 2^31 threshold)
    sa32 = np.empty(n, dtype=np.int64)
    rc = lib.sais_u8(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        sa32.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert rc == 0
    assert np.array_equal(sa32, expect[1:].astype(np.int64))
    # int64 template parity
    lib.sais_u8_force64.restype = ctypes.c_int
    lib.sais_u8_force64.argtypes = lib.sais_u8.argtypes
    sa64 = np.empty(n, dtype=np.int64)
    rc = lib.sais_u8_force64(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        sa64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert rc == 0
    assert np.array_equal(sa64, expect[1:].astype(np.int64))


def test_bwt_lf_property(rng):
    """LF-mapping on the built structures reproduces the suffix array."""
    codes = rng.integers(0, 4, size=500).astype(np.uint8)
    sa = suffix_array(codes)
    bwt, primary = bwt_from_sa(codes, sa)
    n = len(codes)
    # reconstruct text by walking LF from the row of suffix 0
    counts = np.zeros(4, dtype=np.int64)
    for c in bwt:
        counts[c] += 1
    C = np.zeros(4, dtype=np.int64)
    C[0] = 1
    for c in range(1, 4):
        C[c] = C[c - 1] + counts[c - 1]

    occ_prefix = np.zeros((n + 1, 4), dtype=np.int64)
    for c in range(4):
        occ_prefix[1:, c] = np.cumsum(bwt == c)

    def occ(c, k):
        kp = k - (1 if k > primary else 0)
        return occ_prefix[kp, c]

    # invert the BWT: start at the sentinel row (row 0, SA[0] == n);
    # each LF step prepends one character of the text.
    row = 0
    text = []
    for _ in range(n):
        kp = row - (1 if row > primary else 0)
        c = bwt[kp]
        text.append(c)
        row = C[c] + occ(c, row)
    assert row == primary  # ends at the SA==0 row
    assert np.array_equal(np.asarray(text[::-1], dtype=np.uint8), codes)


def test_fm_occ_table(rng):
    g = make_genome(rng, 5000)
    idx = build_index(g, sa_rate=4)
    sa = suffix_array(g.codes)
    bwt, primary = bwt_from_sa(g.codes, sa)
    # occ entries must equal prefix counts at every word boundary
    nw = idx.bwt.shape[0]
    occ = np.asarray(idx.occ).reshape(nw, 4)
    for w in [0, 1, nw // 2, nw - 1]:
        for c in range(4):
            assert occ[w, c] == np.sum(bwt[: w * 16] == c)
    # words decode back to the bwt
    assert np.array_equal(dna.unpack_words(np.asarray(idx.bwt), len(bwt)), bwt)


def test_sa_sampling_structures(rng):
    g = make_genome(rng, 3000)
    idx = build_index(g, sa_rate=8)
    sa = suffix_array(g.codes)
    marked = (sa % 8) == 0
    assert idx.sa_samples.shape[0] == marked.sum()
    # spot-check bitvector + exclusive rank directory
    rows = np.flatnonzero(marked)
    for row in rows[:: max(1, len(rows) // 20)]:
        w, o = row >> 5, row & 31
        assert (idx.mark_words[w] >> o) & 1 == 1
        below = int(idx.mark_rank[w]) + bin(
            int(idx.mark_words[w]) & ((1 << o) - 1)).count("1")
        assert below == int(np.flatnonzero(rows == row)[0])


def test_lut_intervals(rng):
    g = make_genome(rng, 4000)
    idx = build_index(g, sa_rate=4, lut_k=4)
    sa = suffix_array(g.codes)
    codes = g.codes
    n = len(codes)
    # for a few k-mers, the LUT interval must equal the brute-force row range
    for m in [0, 1, 77, 200, 255]:
        kmer = [(m >> (2 * (3 - j))) & 3 for j in range(4)]
        match = np.zeros(n + 1, dtype=bool)
        for r in range(n + 1):
            s = sa[r]
            if s + 4 <= n and all(codes[s + j] == kmer[j] for j in range(4)):
                match[r] = True
        rows = np.flatnonzero(match)
        lo, hi = int(idx.lut_lo[m]), int(idx.lut_hi[m])
        if len(rows):
            assert lo == rows[0] and hi == rows[-1] + 1
        else:
            assert lo == hi


def test_save_load_roundtrip(tmp_path, small_index):
    save_index(small_index, tmp_path / "idx")
    loaded = load_index(tmp_path / "idx")
    assert loaded.n == small_index.n
    assert loaded.primary == small_index.primary
    assert np.array_equal(loaded.occ, small_index.occ)
    assert np.array_equal(loaded.bwt, small_index.bwt)
    assert np.array_equal(loaded.sa_samples, small_index.sa_samples)
    assert loaded.names == small_index.names


def test_v1_format_upgrade(tmp_path, small_index, rng):
    """A v1 directory (interleaved 128bp fmi/mark rows) upgrades in place
    to the v2 flat layout with identical query semantics."""
    import json
    import os

    from soap3dp_tpu.index.builder import MARK_INTERVAL

    idx = small_index
    path = tmp_path / "v1idx"
    save_index(idx, path)
    n = idx.n
    # reconstruct the v1 arrays from the v2 ones and rewrite the dir
    nw, nmw = idx.bwt.shape[0], idx.mark_words.shape[0]
    nb = n // 128 + 1
    occ = np.asarray(idx.occ).reshape(nw, 4)
    words = np.zeros(nb * 8, np.uint32)
    words[:nw] = idx.bwt
    fmi = np.zeros((nb, 12), np.uint32)
    fmi[:, 4:12] = words.reshape(nb, 8)
    for b in range(nb):
        fmi[b, :4] = occ[min(b * 8, nw - 1), :]
    mwords = np.zeros(nb * 4, np.uint32)
    mwords[:nmw] = idx.mark_words
    mark = np.zeros((nb, 5), np.uint32)
    mark[:, 1:5] = mwords.reshape(nb, 4)
    for b in range(nb):
        mark[b, 0] = idx.mark_rank[min(b * 4, nmw - 1)]
    np.save(path / "fmi.npy", fmi)
    np.save(path / "mark.npy", mark)
    for name in ("occ", "bwt", "mark_rank", "mark_words"):
        os.unlink(path / f"{name}.npy")
    meta = json.load(open(path / "meta.json"))
    meta["format_version"] = 1
    json.dump(meta, open(path / "meta.json", "w"))

    up = load_index(path)
    assert np.array_equal(up.occ, idx.occ)
    assert np.array_equal(up.bwt, idx.bwt)
    assert np.array_equal(up.mark_rank, idx.mark_rank)
    assert np.array_equal(up.mark_words, idx.mark_words)
    assert json.load(open(path / "meta.json"))["format_version"] == 2


def test_ambiguity_regions(rng):
    g = make_genome(rng, 2000, n_run=(500, 25))
    assert g.amb_lengths.max() == 25
    starts, ends = g.excluded_region_mask()
    assert len(starts) == 1 and starts[0] == 500 and ends[0] == 525
    # N encoded as G
    assert np.all(g.codes[500:525] == dna.G)


def test_resumable_build_matches_clean(tmp_path, rng, monkeypatch):
    """build_index_to checkpoints each stage: an interrupted build
    resumes after its last completed stage without recomputing the
    suffix array, and the resumed index equals a clean build
    (SURVEY.md section 5: index build resumable per-stage)."""
    import soap3dp_tpu.index.builder as bmod
    from soap3dp_tpu.index.builder import build_index, build_index_to

    genome = make_genome(rng, 5_000, num_chrom=2, n_run=(1200, 40))
    clean = build_index(genome, sa_rate=4, lut_k=5)

    # interrupt the first build mid-way: the lut stage raises
    boom = RuntimeError("simulated interruption")
    real_lut = bmod._build_lut
    monkeypatch.setattr(bmod, "_build_lut",
                        lambda *a, **k: (_ for _ in ()).throw(boom))
    with pytest.raises(RuntimeError):
        build_index_to(genome, tmp_path / "idx", sa_rate=4, lut_k=5)
    assert (tmp_path / "idx" / "build_state.json").exists()
    assert (tmp_path / "idx" / "sa.tmp.npy").exists()
    assert not (tmp_path / "idx" / "meta.json").exists()

    # resume: the sa/fm/sampling stages must NOT rerun
    monkeypatch.setattr(bmod, "_build_lut", real_lut)
    for name in ("suffix_array", "bwt_from_sa", "_build_fm_tables",
                 "_build_sa_sampling"):
        monkeypatch.setattr(
            bmod, name, lambda *a, _n=name, **k: (_ for _ in ()).throw(
                AssertionError(f"{_n} reran on resume")))
    resumed = build_index_to(genome, tmp_path / "idx", sa_rate=4, lut_k=5)
    assert not (tmp_path / "idx" / "build_state.json").exists()
    assert not (tmp_path / "idx" / "sa.tmp.npy").exists()

    for field in ("occ", "bwt", "mark_rank", "mark_words", "sa_samples",
                  "lut_lo", "lut_hi", "pac", "counts", "offsets",
                  "amb_starts", "amb_ends"):
        assert np.array_equal(np.asarray(getattr(resumed, field)),
                              np.asarray(getattr(clean, field))), field
    assert resumed.primary == clean.primary
    assert resumed.n == clean.n

    # a finished directory loads straight back (idempotent re-invoke)
    again = build_index_to(genome, tmp_path / "idx", sa_rate=4, lut_k=5)
    assert np.array_equal(np.asarray(again.occ), np.asarray(clean.occ))


def test_resumable_build_rejects_mismatched_genome(tmp_path, rng, monkeypatch):
    """A partial build for genome A must not be resumed with genome B:
    the fingerprint mismatch discards the stale state."""
    import soap3dp_tpu.index.builder as bmod
    from soap3dp_tpu.index.builder import build_index, build_index_to

    g1 = make_genome(rng, 4_000)
    g2 = make_genome(rng, 4_000)

    boom = RuntimeError("simulated interruption")
    real = bmod._build_lut  # runs in both the native-fused and numpy paths
    monkeypatch.setattr(bmod, "_build_lut",
                        lambda *a, **k: (_ for _ in ()).throw(boom))
    with pytest.raises(RuntimeError):
        build_index_to(g1, tmp_path / "idx", sa_rate=4, lut_k=5)
    monkeypatch.setattr(bmod, "_build_lut", real)

    # resuming with a different genome rebuilds from scratch
    out = build_index_to(g2, tmp_path / "idx", sa_rate=4, lut_k=5)
    clean2 = build_index(g2, sa_rate=4, lut_k=5)
    assert np.array_equal(np.asarray(out.sa_samples),
                          np.asarray(clean2.sa_samples))
    assert out.primary == clean2.primary


def test_v1_upgrade_readonly_dir(tmp_path, small_index, monkeypatch):
    """A v1 index on a read-only directory must still load (the upgrade
    stays in memory when persisting fails — multi-host processes may
    share one read-only index dir). Write failure is simulated by
    monkeypatch (the suite runs as root, where chmod does not bind).
    """
    import json
    import os
    import shutil

    # build a v1 dir by reusing the reconstruction from the test above
    # (cheapest: run the upgrade test's setup via save + downgrade)
    idx = small_index
    path = tmp_path / "v1ro"
    save_index(idx, path)
    n = idx.n
    nw, nmw = idx.bwt.shape[0], idx.mark_words.shape[0]
    nb = n // 128 + 1
    occ = np.asarray(idx.occ).reshape(nw, 4)
    words = np.zeros(nb * 8, np.uint32)
    words[:nw] = idx.bwt
    fmi = np.zeros((nb, 12), np.uint32)
    fmi[:, 4:12] = words.reshape(nb, 8)
    for b in range(nb):
        fmi[b, :4] = occ[min(b * 8, nw - 1), :]
    mwords = np.zeros(nb * 4, np.uint32)
    mwords[:nmw] = idx.mark_words
    mark = np.zeros((nb, 5), np.uint32)
    mark[:, 1:5] = mwords.reshape(nb, 4)
    for b in range(nb):
        mark[b, 0] = idx.mark_rank[min(b * 4, nmw - 1)]
    np.save(path / "fmi.npy", fmi)
    np.save(path / "mark.npy", mark)
    for name in ("occ", "bwt", "mark_rank", "mark_words"):
        os.unlink(path / f"{name}.npy")
    meta = json.load(open(path / "meta.json"))
    meta["format_version"] = 1
    json.dump(meta, open(path / "meta.json", "w"))

    from soap3dp_tpu.index import builder as bld

    def deny_save(*a, **kw):
        raise PermissionError("read-only filesystem (simulated)")

    monkeypatch.setattr(bld.np, "save", deny_save)
    try:
        up = load_index(path)
    finally:
        monkeypatch.undo()
    assert np.array_equal(up.occ, idx.occ)
    assert np.array_equal(up.bwt, idx.bwt)
    # dir untouched: still v1 on disk, and the lock was released
    assert json.load(open(path / "meta.json"))["format_version"] == 1
    assert not os.path.exists(path / "upgrade.lock")
    shutil.rmtree(path)
