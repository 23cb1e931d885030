#!/usr/bin/env python
"""Same-weather wall-time A/B of the wired Pallas extract (auto/off/auto,
best of 2 each) on the bench workload."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os, time

fq = "/tmp/kmc_tpu_bench/reads_8388608_30.fastq"
tuned = dict(batch_positions=1 << 23, device_store_rows=1 << 28)

def run(mode, out, n=2):
    os.environ["KMC_TPU_PALLAS_EXTRACT"] = mode
    from kmc_tpu.runner import count
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        res1, res2 = count([fq], out, k=27, cutoff_min=2, **tuned)
        el = time.perf_counter() - t0
        if best is None or el < best[0]:
            best = (el, res1.time, res2.time_finalize_exec)
    print(f"mode={mode}: wall={best[0]:.2f}s stage1={best[1]:.2f}s "
          f"finalize_exec={best[2]:.2f}s", flush=True)

# interleave would be better but jit statics make runs independent anyway
run("auto", "/tmp/kmc_tpu_bench/ab_pal")
run("off", "/tmp/kmc_tpu_bench/ab_xla")
run("auto", "/tmp/kmc_tpu_bench/ab_pal2")
