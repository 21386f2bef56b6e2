"""Golden SAM fixtures: full-record output pinned against checked-in files.

The rebuild's analog of the reference's own validation procedure
(BGS-TestNote.log:1-40: run two implementations on the same index+reads,
normalize, diff). Here the "other implementation" is the frozen,
hand-verified output of this pipeline on a deterministic planted
dataset — any change to record content (flags, positions, MAPQ, CIGARs,
tags, tie-breaking) trips the diff.

Regenerate intentionally with:  python tests/test_golden_sam.py --regen
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

CASES = [
    ("pair_h1_md", dict(paired=True, output_mode=1, output_md=True)),
    ("pair_h2", dict(paired=True, output_mode=2)),
    ("pair_h3", dict(paired=True, output_mode=3)),
    ("pair_h4", dict(paired=True, output_mode=4)),
    ("single_h2_md", dict(paired=False, output_mode=2, output_md=True)),
    ("single_h1", dict(paired=False, output_mode=1)),
    # k=4 through the full PE pipeline: reads re-planted with exactly 4
    # substitutions spread over all 5 pigeonhole segments (VERDICT r3
    # item 6; reference 4-mismatch kernels DV-Kernel.cu:4505-4741)
    ("pair_h2_k4", dict(paired=True, output_mode=2, mismatches=4,
                        plant4=True)),
]


def _workload(plant4: bool = False):
    import __graft_entry__ as g

    index, b1, b2, opts = g.make_tiny_pair_workload(
        genome_bp=100_000, n_pairs=36, read_len=64, insert=200, seed=12)
    if plant4:
        # deterministic 4-substitution planting on the first 12 pairs
        # (both ends) — BWT-alignable only at k=4
        for b in (b1, b2):
            for i in range(12):
                for off in (7, 21, 38, 55):
                    b.codes[i, off] = (b.codes[i, off] + 1 + off % 3) % 4
    # quality ramp so quality-aware paths are covered deterministically
    L = b1.codes.shape[1]
    q = (33 + 5 + (np.arange(L, dtype=np.uint8) % 36))[None, :]
    b1.quals = np.repeat(q, len(b1), axis=0)
    b2.quals = np.repeat(q[:, ::-1], len(b2), axis=0)
    return index, b1, b2


def _render(case_opts) -> str:
    from soap3dp_tpu.fm.fmindex import device_index
    from soap3dp_tpu.io.sam import SamWriter
    from soap3dp_tpu.pipeline.options import AlignOptions
    from soap3dp_tpu.pipeline.pair import align_pair_batch
    from soap3dp_tpu.pipeline.single import align_single_batch

    index, b1, b2 = _workload(case_opts.get("plant4", False))
    didx = device_index(index)
    opts = AlignOptions(min_insert=100, max_insert=400,
                        output_mode=case_opts["output_mode"],
                        output_md=case_opts.get("output_md", False),
                        soap3_mismatch_allow=case_opts.get("mismatches", 3),
                        random_seed=7)
    buf = io.BytesIO()
    w = SamWriter(buf, index)
    if case_opts["paired"]:
        align_pair_batch(index, didx, b1, b2, opts, w)
    else:
        align_single_batch(index, didx, b1, opts, w)
    # drop the @PG line (carries the package version)
    lines = [l for l in buf.getvalue().decode().splitlines()
             if not l.startswith("@PG")]
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("name,case_opts", CASES)
def test_golden_sam(name, case_opts):
    path = os.path.join(GOLDEN_DIR, f"{name}.sam")
    assert os.path.exists(path), (
        f"golden file missing; run: python {__file__} --regen")
    got = _render(case_opts).splitlines()
    want = open(path).read().splitlines()
    assert len(got) == len(want), (name, len(got), len(want))
    for i, (g_line, w_line) in enumerate(zip(got, want)):
        gf, wf = g_line.split("\t"), w_line.split("\t")
        assert gf == wf, f"{name} line {i}:\n got: {g_line}\nwant: {w_line}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, case_opts in CASES:
            out = _render(case_opts)
            with open(os.path.join(GOLDEN_DIR, f"{name}.sam"), "w") as fh:
                fh.write(out)
            print(f"wrote {name}.sam ({out.count(chr(10))} lines)")
    else:
        print("use --regen to regenerate golden files", file=sys.stderr)
