"""Reconstruction quality metrics (D1/D2 PSNR etc.)."""

from nvfpcc_tpu.metrics.d1 import d1_psnr  # noqa: F401
from nvfpcc_tpu.metrics.d2 import d2_psnr, estimate_normals, nn_vectors  # noqa: F401
