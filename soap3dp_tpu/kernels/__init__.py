from soap3dp_tpu.kernels.banded_dp import DPScores, dp_forward, dp_traceback

__all__ = ["DPScores", "dp_forward", "dp_traceback"]
