"""kmc_tpu — a TPU-native k-mer counting framework.

A from-scratch reimplementation of the capabilities of refresh-bio/KMC
(reference mounted at /root/reference) designed for TPUs: reads are packed
into 2-bit streams on device, k-mers / minimizer signatures are derived with
pure vector ops (no gathers), counting is sort+segment-reduce on device, and
multi-chip scaling shards input batches and owner-partitions signature bins
across a jax.sharding.Mesh.
"""

import os as _os

from .defs import KMC_TPU_VER as __version__


def _enable_compilation_cache():
    """Persist XLA compilations across processes: first compile of the big
    kernels is 30-90s on this setup, cached reloads are ~ms.  Opt out with
    KMC_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("KMC_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "KMC_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/kmc_tpu_xla")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


if _os.environ.get("KMC_TPU_NO_JAX"):
    # host-only mode: formats/ and the streaming tools are pure NumPy;
    # skipping the runner import keeps jax (and its memory) out of
    # kmc_tools-style processes on machines without accelerators
    pass
else:
    _enable_compilation_cache()

    from .runner import (  # noqa: E402
        Runner,
        Stage1Params,
        Stage2Params,
        Stage1Results,
        Stage2Results,
        InputFileType,
        OutputFileType,
    )
