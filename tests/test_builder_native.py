"""Differential tests: native fused table builder vs the numpy stages.

The native pass (native/index_build.cpp) must produce bit-identical
artifacts to builder._build_fm_tables / _build_sa_sampling /
suffix_array.bwt_from_sa / builder._build_lut for any genome — these
are the persisted index arrays, so equality here is format correctness.
"""

import numpy as np
import pytest

from soap3dp_tpu.index import build_native, builder
from soap3dp_tpu.index.suffix_array import bwt_from_sa, suffix_array

pytestmark = pytest.mark.skipif(not build_native.available(),
                                reason="native index_build unavailable")


def _numpy_reference(codes, sa, sa_rate):
    bwt, primary = bwt_from_sa(codes, sa)
    occ, bwt_words = builder._build_fm_tables(bwt, len(codes))
    mark_rank, mark_words, sa_samples = builder._build_sa_sampling(
        sa, len(codes), sa_rate)
    return occ, bwt_words, mark_rank, mark_words, sa_samples, primary


@pytest.mark.parametrize("n,rate", [(17, 1), (31, 2), (32, 2), (33, 4),
                                    (1000, 2), (4097, 8), (65539, 4)])
def test_fused_tables_match_numpy(n, rate, rng):
    codes = rng.integers(0, 4, n).astype(np.uint8)
    sa = suffix_array(codes)
    got = build_native.fused_tables(codes, sa, rate)
    assert got is not None
    occ, bw, mr, mw, ss, primary, bc = got
    ref = _numpy_reference(codes, sa, rate)
    np.testing.assert_array_equal(occ, ref[0])
    np.testing.assert_array_equal(bw, ref[1])
    np.testing.assert_array_equal(mr, ref[2])
    np.testing.assert_array_equal(mw, ref[3])
    np.testing.assert_array_equal(ss, ref[4])
    assert primary == ref[5]
    np.testing.assert_array_equal(
        bc, np.bincount(codes, minlength=4).astype(np.uint64))


@pytest.mark.parametrize("n,k", [(40, 3), (1000, 5), (100_000, 8),
                                 (17, 6)])
def test_lut_matches_numpy(n, k, rng):
    codes = rng.integers(0, 4, n).astype(np.uint8)
    lo_n, hi_n = build_native.lut_native(codes, k)
    # numpy path with the native dispatch disabled
    import os
    os.environ["SOAP3DP_NO_NATIVE"] = "1"
    try:
        lo_p, hi_p = builder._build_lut(codes, None, k)
    finally:
        del os.environ["SOAP3DP_NO_NATIVE"]
    np.testing.assert_array_equal(lo_n, lo_p)
    np.testing.assert_array_equal(hi_n, hi_p)


def test_full_build_uses_native_and_matches(tmp_path, rng):
    """End-to-end: a build with the native path loads identically to a
    numpy-only build of the same genome."""
    import os

    from soap3dp_tpu.index.packing import PackedGenome
    from soap3dp_tpu.utils import dna

    n = 50_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    genome = PackedGenome(
        codes=codes, pac=dna.pack_codes(codes), length=n, names=["c1"],
        offsets=np.asarray([0, n], np.uint64),
        amb_starts=np.zeros(0, np.uint64),
        amb_lengths=np.zeros(0, np.uint64))
    ix_nat = builder.build_index_to(genome, tmp_path / "nat.t3i", sa_rate=4)
    os.environ["SOAP3DP_NO_NATIVE"] = "1"
    try:
        ix_np = builder.build_index_to(genome, tmp_path / "np.t3i", sa_rate=4)
    finally:
        del os.environ["SOAP3DP_NO_NATIVE"]
    assert ix_nat.primary == ix_np.primary
    for name in builder._ARRAYS:
        np.testing.assert_array_equal(
            np.asarray(getattr(ix_nat, name)),
            np.asarray(getattr(ix_np, name)), err_msg=name)
