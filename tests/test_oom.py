"""Device-OOM degradation ladder tests.

The reference degrades GPU DP block counts until allocation succeeds
(tryAlloc, DV-DPfunctions.cu:554-612). The rebuild's ladder has two
rungs: (1) index upload re-samples the SA coarser until it fits HBM,
(2) the batch loop halves an over-budget batch. Both preserve
correctness; only throughput degrades.
"""

import numpy as np
import pytest

from soap3dp_tpu.fm import fmindex
from soap3dp_tpu.index.builder import build_index, resample_sa
from tests.conftest import make_genome


class FakeXlaRuntimeError(Exception):
    pass


def _oom():
    return FakeXlaRuntimeError(
        "RESOURCE_EXHAUSTED: Out of memory allocating 12884901888 bytes")


def test_resample_sa_matches_direct_build(rng):
    genome = make_genome(rng, 6_000)
    fine = build_index(genome, sa_rate=2, lut_k=5)
    coarse = build_index(genome, sa_rate=8, lut_k=5)
    res = resample_sa(fine, 8)
    assert res.sa_rate == 8
    assert np.array_equal(np.asarray(res.sa_samples),
                          np.asarray(coarse.sa_samples))
    assert np.array_equal(np.asarray(res.mark_words),
                          np.asarray(coarse.mark_words))
    assert np.array_equal(np.asarray(res.mark_rank),
                          np.asarray(coarse.mark_rank))
    # untouched tables are shared/equal
    assert np.array_equal(np.asarray(res.occ), np.asarray(fine.occ))


def test_resample_sa_decode_still_correct(rng):
    """SA decode after resampling returns the same text positions."""
    genome = make_genome(rng, 4_000)
    fine = build_index(genome, sa_rate=2, lut_k=5)
    res = resample_sa(fine, 16)
    d_fine = fmindex.device_index(fine)
    d_res = fmindex.device_index(res)
    rows = rng.integers(0, fine.num_rows, size=200).astype(np.uint32)
    valid = np.ones(200, bool)
    p1 = np.asarray(fmindex.sa_decode(d_fine, rows, valid))
    p2 = np.asarray(fmindex.sa_decode(d_res, rows, valid))
    assert np.array_equal(p1, p2)


def test_resample_sa_rejects_bad_rate(rng):
    genome = make_genome(rng, 2_000)
    idx = build_index(genome, sa_rate=4, lut_k=5)
    with pytest.raises(ValueError):
        resample_sa(idx, 6)     # not a power of two
    with pytest.raises(ValueError):
        resample_sa(idx, 2)     # finer than current


def test_is_oom_error():
    assert fmindex.is_oom_error(_oom())
    assert fmindex.is_oom_error(RuntimeError("Allocation failure: HBM"))
    assert not fmindex.is_oom_error(ValueError("bad shape"))


def test_device_index_ladder_degrades_until_fit(rng, monkeypatch, capsys):
    genome = make_genome(rng, 6_000)
    idx = build_index(genome, sa_rate=2, lut_k=5)
    real_upload = fmindex.device_index

    def flaky_upload(index, sharding=None):
        if index.sa_rate < 8:
            raise _oom()
        return real_upload(index, sharding=sharding)

    monkeypatch.setattr(fmindex, "device_index", flaky_upload)
    didx, host = fmindex.device_index_ladder(idx)
    assert host.sa_rate == 8
    assert didx.sa_rate == 8
    assert "degrading to sa_rate=4" in capsys.readouterr().err
    # the degraded index still decodes correctly
    rows = rng.integers(0, idx.num_rows, size=64).astype(np.uint32)
    valid = np.ones(64, bool)
    p_ref = np.asarray(fmindex.sa_decode(real_upload(idx), rows, valid))
    assert np.array_equal(np.asarray(fmindex.sa_decode(didx, rows, valid)),
                          p_ref)


def test_device_index_ladder_proactive_budget(rng, capsys):
    """With a byte budget, the ladder degrades BEFORE touching the
    device (predicted RESOURCE_EXHAUSTED)."""
    genome = make_genome(rng, 6_000)
    idx = build_index(genome, sa_rate=1, lut_k=5)
    full = fmindex.index_hbm_bytes(idx)
    # budget between the rate-4 and rate-1 footprints
    sa_bytes = np.asarray(idx.sa_samples).nbytes
    budget = full - sa_bytes // 2
    didx, host = fmindex.device_index_ladder(idx, hbm_budget=budget)
    assert host.sa_rate > 1
    assert fmindex.index_hbm_bytes(host) <= budget


def test_device_index_ladder_gives_up_at_max_rate(rng, monkeypatch):
    genome = make_genome(rng, 2_000)
    idx = build_index(genome, sa_rate=4, lut_k=5)
    monkeypatch.setattr(fmindex, "device_index",
                        lambda *a, **k: (_ for _ in ()).throw(_oom()))
    with pytest.raises(FakeXlaRuntimeError):
        fmindex.device_index_ladder(idx, max_rate=16)


def test_device_index_ladder_reraises_non_oom(rng, monkeypatch):
    genome = make_genome(rng, 2_000)
    idx = build_index(genome, sa_rate=4, lut_k=5)
    monkeypatch.setattr(
        fmindex, "device_index",
        lambda *a, **k: (_ for _ in ()).throw(ValueError("not oom")))
    with pytest.raises(ValueError):
        fmindex.device_index_ladder(idx)


def test_align_backoff_halves_on_oom(rng):
    """An OOM-throwing batch aligns as halves; every read is aligned
    exactly once and the floor stops infinite splitting."""
    from soap3dp_tpu.cli.runner import _align_backoff
    from soap3dp_tpu.io.fastq import ReadBatch
    from soap3dp_tpu.pipeline.single import BatchSummary

    n = 2000
    codes = rng.integers(0, 4, size=(n, 20)).astype(np.uint8)
    batch = ReadBatch(names=[b"r%d" % i for i in range(n)], codes=codes,
                      lens=np.full(n, 20, np.int32), quals=None)
    seen: list[bytes] = []

    def align_one(b, _pending):
        if len(b.names) > 600:
            raise _oom()
        seen.extend(b.names)
        s = BatchSummary()
        s.num_reads = len(b.names)
        return s

    total = _align_backoff(align_one, BatchSummary, (batch,), min_reads=64)
    assert total.num_reads == n
    assert sorted(seen) == sorted(batch.names)


def test_align_backoff_floor_reraises(rng):
    from soap3dp_tpu.cli.runner import _align_backoff
    from soap3dp_tpu.io.fastq import ReadBatch
    from soap3dp_tpu.pipeline.single import BatchSummary

    batch = ReadBatch(names=[b"a", b"b"],
                      codes=np.zeros((2, 8), np.uint8),
                      lens=np.full(2, 8, np.int32), quals=None)
    with pytest.raises(FakeXlaRuntimeError):
        _align_backoff(lambda b, _p: (_ for _ in ()).throw(_oom()),
                       BatchSummary, (batch,), min_reads=64)
