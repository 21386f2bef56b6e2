"""soap3dp_tpu — a TPU-native short-read DNA aligner.

A from-scratch JAX/XLA/Pallas rebuild of the SOAP3-dp method
(reference: aquaskyline/SOAP3-dp, C/C++/CUDA): FM-index ("2BWT") seed
search for exact/mismatch alignment plus semi-global banded affine-gap
dynamic programming rescue, with paired-end insert-size pairing,
BWA-like MAPQ, and SAM/succinct output.

The architecture is TPU-first, not a port:

* the index lives in HBM as flat arrays with an interleaved
  occ-table/BWT-words block layout (one 48-byte row per 128bp block),
* search is a batched, static-shape seed-and-verify pipeline
  (pigeonhole seeds -> backward search -> sampled-SA decode ->
  XOR/popcount verification) instead of the reference's per-thread
  divergent case enumeration (reference DV-Kernel.cu:4249-4502),
* DP rescue is an anti-diagonal wavefront kernel over length-bucketed
  tiles (reference DV-DPfunctions.cu:146-241), and
* scaling is data-parallel over reads via jax.sharding / shard_map
  (the reference scales by one process per GPU, README.md section 3).
"""

from soap3dp_tpu.version import __version__

__all__ = ["__version__"]
