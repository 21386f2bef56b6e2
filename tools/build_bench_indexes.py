"""Build every cached bench index sequentially (one-core host job).

Order: the quick indexes first (most bench profiles need them), the
hour-class 3.1 Gbp repeat-structured human-scale index last.

    nohup python tools/build_bench_indexes.py > build.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg: str) -> None:
    import resource
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[build +{time.time() - T0:7.0f}s rss {rss:5.1f}GB] {msg}",
          file=sys.stderr, flush=True)


def main() -> int:
    os.environ.setdefault("SOAP3DP_BUILD_VERBOSE", "1")
    from bench import CACHE, get_index

    log("40 Mbp (sa1 k14)...")
    get_index(40_000_000, sa_rate=1, lut_k=14)
    log("250 Mbp (sa2 k13)...")
    get_index(250_000_000, sa_rate=2, lut_k=13)

    log("3.1 Gbp repeat-structured genome...")
    from tools import repeat_genome
    from soap3dp_tpu.index.builder import build_index_to

    genome = repeat_genome.load_packed(CACHE, 3_100_000_000)
    log(f"genome ready ({len(genome.amb_starts)} N runs); building index...")
    path = os.path.join(CACHE, repeat_genome.tag_for(3_100_000_000)
                        + ".sa2k13.t3i")
    build_index_to(genome, path, sa_rate=2, lut_k=13)
    log(f"done: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
