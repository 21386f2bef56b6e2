"""Unit tests for MAPQ scoring (reference: BGS-IO.cpp:2280-2463)."""

import numpy as np

from soap3dp_tpu.pipeline import mapq


def test_bwa_like_single_values():
    x0 = np.array([1, 1, 2, 1])
    x1 = np.array([0, 3, 0, 200])
    got = mapq.bwa_like_single(x0, x1)
    assert got[0] == 37            # unique, no suboptimal
    assert got[2] == 0             # multiple best hits
    assert got[1] == max(23 - int(4.343 * np.log(3) + 0.5), 0)
    assert got[3] == max(23 - int(4.343 * np.log(200) + 0.5), 0)


def test_table_single_unique_vs_repeat():
    got = mapq.table_single(nmis=np.array([0, 2, 0]),
                            avg_mis_qual=np.array([20, 35, 20]),
                            x0=np.array([1, 1, 3]), x1=np.array([0, 0, 1]))
    assert got[0] == 40            # unique exact: max_mapq * 1.0
    assert got[1] == int(40 * 0.7)  # 2 mismatches, high-qual bucket
    assert got[2] == 1             # non-unique -> min_mapq


def test_dp_single_bwa_branch():
    got = mapq.dp_single(max_dp_score=100, avg_mis_qual=np.array([20]),
                         x0=np.array([1]), x1_t1=np.array([0]),
                         x1_t2=np.array([0]), best=np.array([95]),
                         second_best=np.array([0]), dp_thres=30.0)
    assert got[0] == 37


def test_dp_single_nonbwa_branch():
    """Non-BWA DP MAPQ: ratio math on best/second-best DP scores."""
    got = mapq.dp_single(max_dp_score=100, avg_mis_qual=np.array([39, 20]),
                         x0=np.array([1, 1]), x1_t1=np.array([0, 0]),
                         x1_t2=np.array([0, 1]), best=np.array([100, 100]),
                         second_best=np.array([0, 50]), dp_thres=30.0,
                         bwa_like=False)
    # unique perfect hit, negligible mis-qual penalty: full max_mapq
    assert got[0] == 40
    # suboptimal present: r1 = 1 - (50-30)/(70-30) = 0.5;
    # 40*0.5*0.5*1 - penalty(q20)=0.75 -> int(9.25) = 9
    assert got[1] == 9


def test_dp_single_nonbwa_degenerate_denominator():
    """0.7*best == dp_thres must not divide by zero (VERDICT r2 item 9);
    with a suboptimal hit present the score collapses to min_mapq."""
    got = mapq.dp_single(
        max_dp_score=100, avg_mis_qual=np.array([20, 20, 20]),
        x0=np.array([1, 1, 1]), x1_t1=np.array([0, 0, 0]),
        x1_t2=np.array([1, 1, 0]),
        best=np.array([30.0 / 0.7, 30, 30.0 / 0.7]),  # denom == 0, < 0, == 0
        second_best=np.array([35, 35, 0]), dp_thres=30.0, bwa_like=False)
    assert np.all(np.isfinite(got))
    assert got[0] == 1 and got[1] == 1
    # no suboptimal hit: denominator irrelevant, r1 = 1
    assert got[2] >= 1


def test_bwa_like_pair_both_unique():
    o0, o1 = mapq.bwa_like_pair(
        x0_0=np.array([1]), x1_0=np.array([0]),
        x0_1=np.array([1]), x1_1=np.array([0]),
        op_score=np.array([19]), op_num=np.array([1]),
        subop_score=np.array([0]), subop_num=np.array([0]),
        readlen_0=np.array([100]), readlen_1=np.array([100]))
    assert o0[0] == 60 and o1[0] == 60


def test_bwa_like_pair_one_end_rescued():
    # end 0 ambiguous (m0 == 0), unique pair, no suboptimal: pair-level 29
    o0, o1 = mapq.bwa_like_pair(
        x0_0=np.array([5]), x1_0=np.array([0]),
        x0_1=np.array([1]), x1_1=np.array([0]),
        op_score=np.array([19]), op_num=np.array([1]),
        subop_score=np.array([0]), subop_num=np.array([0]),
        readlen_0=np.array([100]), readlen_1=np.array([100]))
    assert o0[0] == min(29 + 7, 37) and o1[0] == 37
