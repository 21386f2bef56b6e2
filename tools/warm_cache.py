"""Pre-populate the persistent XLA executable cache (.jaxcache).

Runs a tiny representative workload through the pipeline's compiled
shape family — single + pair alignment, all three output formats, a
rescue flush — so a fresh process (or container) starts hot. The
reference has no analog (CUDA kernels ship precompiled); this is the
JAX equivalent of shipping cubins (see utils/jaxcache.py).

Usage:
  python tools/warm_cache.py [index_dir]

Without an index argument a throwaway 2 Mbp index is built (its
shapes bucket identically to production ones for the executables that
matter: the bucketed search/DP shapes are read-count-driven, not
genome-size-driven).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def main() -> int:
    import numpy as np

    from soap3dp_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    from soap3dp_tpu.fm.fmindex import device_index
    from soap3dp_tpu.index.builder import build_index, load_index
    from soap3dp_tpu.index.packing import PackedGenome
    from soap3dp_tpu.io.fastq import ReadBatch
    from soap3dp_tpu.io.sam import SamWriter
    from soap3dp_tpu.io.succinct import BamWriter, SuccinctWriter
    from soap3dp_tpu.pipeline.options import AlignOptions
    from soap3dp_tpu.pipeline.pair import (Phase2Queue, RescueQueue,
                                           align_pair_batch,
                                           dispatch_pair_search)
    from soap3dp_tpu.pipeline.single import (SinglePhase2Queue,
                                             align_single_batch,
                                             dispatch_single_search)
    from soap3dp_tpu.utils.dna import pack_codes

    t0 = time.time()
    if len(sys.argv) > 1:
        index = load_index(sys.argv[1])
        rng = np.random.default_rng(0)
        codes = None
    else:
        rng = np.random.default_rng(0)
        n = 2_000_000
        codes = rng.integers(0, 4, n).astype(np.uint8)
        genome = PackedGenome(
            codes=codes, pac=pack_codes(codes), length=n, names=["chr1"],
            offsets=np.array([0, n], np.uint64),
            amb_starts=np.zeros(0, np.uint64),
            amb_lengths=np.zeros(0, np.uint64))
        index = build_index(genome, sa_rate=2)
    didx = device_index(index)
    print(f"[warm] index on device +{time.time() - t0:.1f}s",
          file=sys.stderr)

    B, L, INS = 4096, 100, 300
    n = int(index.n)
    if codes is None:
        codes = rng.integers(0, 4, min(n, 4_000_000)).astype(np.uint8)
        planted = False
    else:
        planted = True
    pos = rng.integers(0, len(codes) - INS - 1, B)
    left = np.empty((B, L), np.uint8)
    right = np.empty((B, L), np.uint8)
    for i in range(B):
        seg = codes[pos[i]:pos[i] + INS]
        left[i] = seg[:L]
        right[i] = 3 - seg[INS - L:][::-1]
    # force every rescue phase to compile: garble some ends
    left[: B // 64] = rng.integers(0, 4, (B // 64, L))
    right[B // 64: B // 32] = rng.integers(0, 4, (B // 64, L))
    names = np.array([b"w%06d" % i for i in range(B)])
    lens = np.full(B, L, np.int32)
    b1 = ReadBatch(names=names, codes=left, lens=lens, quals=None)
    b2 = ReadBatch(names=names, codes=right, lens=lens.copy(), quals=None)
    opts = AlignOptions(min_insert=INS // 2, max_insert=INS * 2,
                        soap3_mismatch_allow=3)

    with tempfile.TemporaryDirectory() as d:
        writers = [SuccinctWriter(os.path.join(d, "w.gout"), index),
                   SamWriter(os.path.join(d, "w.sam"), index),
                   BamWriter(os.path.join(d, "w.bam"), index)]
        for w in writers:
            rq = RescueQueue(index, didx, opts)
            p2q = Phase2Queue(index, didx, opts)
            sp2 = SinglePhase2Queue(index, didx, opts)
            # drive through the dispatch path so the phased shapes
            # compile too (the gate decides per index)
            pend = dispatch_pair_search(didx, b1, b2, opts)
            align_pair_batch(index, didx, b1, b2, opts, w,
                             pending_search=pend, rescue_queue=rq,
                             phase2_queue=p2q)
            p2q.process(w, rq)
            rq.flush(w)
            align_single_batch(index, didx, b1, opts, w,
                               pending_search=dispatch_single_search(
                                   didx, b1, opts),
                               phase2_queue=sp2)
            sp2.process(w)
            w.close()
            print(f"[warm] {type(w).__name__} +{time.time() - t0:.1f}s",
                  file=sys.stderr)
    if planted:
        pass  # alignment correctness is CI's job; this only compiles
    print(f"[warm] done in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
