"""Worker for the multi-host CLI test (tests/test_multihost.py):
runs the REAL `soap3dp pair` CLI under jax.distributed as one of N
processes, producing a per-host output shard `<prefix>.<host_id>.sam`
— the analog of the reference's per-process .gout.N outputs
(README.md section 3)."""

import os
import sys


def main() -> int:
    host_id, hosts, port, workdir = (sys.argv[1], sys.argv[2], sys.argv[3],
                                     sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from soap3dp_tpu.cli.main import main as cli_main

    os.chdir(workdir)
    return cli_main([
        "pair", "g.fa.index", "p1.fq", "p2.fq",
        "-o", "out_mh", "-v", "150", "-u", "600", "-s", "2",
        "--batch-size", "16",
        "--hosts", hosts, "--host-id", host_id,
        "--coordinator", f"localhost:{port}",
    ])


if __name__ == "__main__":
    sys.exit(main())
