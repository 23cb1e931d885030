"""kmc_tpu — a TPU-native k-mer counting framework.

A from-scratch reimplementation of the capabilities of refresh-bio/KMC
(reference mounted at /root/reference) designed for TPUs: reads are packed
into 2-bit streams on device, k-mers / minimizer signatures are derived with
pure vector ops (no gathers), counting is sort+segment-reduce on device, and
multi-chip scaling shards input batches and owner-partitions signature bins
across a jax.sharding.Mesh.
"""

from .defs import KMC_TPU_VER as __version__

from .runner import (  # noqa: E402
    Runner,
    Stage1Params,
    Stage2Params,
    Stage1Results,
    Stage2Results,
    InputFileType,
    OutputFileType,
)
