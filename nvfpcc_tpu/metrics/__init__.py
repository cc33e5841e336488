"""Reconstruction quality metrics (D1 PSNR etc.)."""

from nvfpcc_tpu.metrics.d1 import d1_psnr  # noqa: F401
