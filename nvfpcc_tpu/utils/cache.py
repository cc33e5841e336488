"""Persistent XLA compilation cache.

Every CLI process pays a fresh XLA compile (60-90 s through the axon TPU
tunnel) for programs the previous process already built. JAX's persistent
compilation cache serializes executables to disk; enabling it makes
encode/decode and repeat train runs start in seconds. (The reference has no
analog — PyTorch eager pays no compile.)
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/nvfpcc_tpu/xla")


def enable_hang_diagnostics() -> None:
    """Register SIGUSR1 to dump all Python thread stacks to stderr.

    Long runs through the TPU tunnel can wedge inside a device call with no
    visible state; `kill -USR1 <pid>` then shows where every thread is
    blocked. Registered by the CLI/server/sweep entry points."""
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError):
        pass  # non-main thread or platform without SIGUSR1


def enable_compilation_cache(directory: str | None = None) -> None:
    """Idempotently enable the on-disk compilation cache. Call before the
    first jit execution (importing jax is fine)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", directory or _DEFAULT_DIR)
        # persist EVERYTHING: on the starved single CPU core even "small"
        # compiles average >1.5 s, and a driver capture runs dozens of them
        # (measured: 52 sub-threshold compiles = 86 s of the round-4 dryrun
        # timeout). Disk is cheap; the default 1.0 s floor is not.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: cache is an optimization only
