"""Build the human-scale (3.1 Gbp) synthetic bench index.

The reference aligns against the whole human genome routinely
(README.md section 2.1, BGS-Experiment.log:8-11); with zero egress this
environment has no GRCh38, so the scale proof uses a synthetic 3.1 Gbp
genome — same text length, same index configuration the memory plan in
docs/SCALING.md prescribes for one 16 GB v5e chip (sa_rate=4, lut_k=13).

Run standalone (it is an hour-class single-core job; bench.py then
finds the cached index):

    python tools/build_human_scale.py
"""

from __future__ import annotations

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HUMAN_BP = 3_100_000_000
SA_RATE = 2
LUT_K = 13


def log(msg: str) -> None:
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[human-build +{time.time() - T0:7.0f}s rss {rss:5.1f}GB] {msg}",
          file=sys.stderr, flush=True)


T0 = time.time()


def main() -> int:
    from bench import CACHE, get_index

    tag = f"synth{HUMAN_BP}.sa{SA_RATE}k{LUT_K}"
    path = os.path.join(CACHE, tag + ".t3i")
    if os.path.exists(os.path.join(path, "meta.json")):
        log(f"already built: {path}")
        return 0
    log(f"building {HUMAN_BP / 1e9:.1f} Gbp index -> {path}")
    get_index(HUMAN_BP, sa_rate=SA_RATE, lut_k=LUT_K)
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
