#!/usr/bin/env python
"""End-to-end A/B on the attached TPU: count the bench input with the
Pallas extract off vs auto and byte-compare the two databases."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os, time
import numpy as np

fq = "/tmp/kmc_tpu_bench/reads_8388608_30.fastq"
tuned = dict(batch_positions=1 << 23, device_store_rows=1 << 28)

def run(mode, out):
    os.environ["KMC_TPU_PALLAS_EXTRACT"] = mode
    from kmc_tpu.runner import count
    t0 = time.perf_counter()
    res1, res2 = count([fq], out, k=27, cutoff_min=2, **tuned)
    el = time.perf_counter() - t0
    print(f"mode={mode}: wall={el:.2f}s stage1={res1.time:.2f}s "
          f"finalize_exec={res2.time_finalize_exec:.2f}s", flush=True)
    return out

a = run("off", "/tmp/kmc_tpu_bench/e2e_xla")
b = run("auto", "/tmp/kmc_tpu_bench/e2e_pal")
for suf in (".kmc_pre", ".kmc_suf"):
    ok = open(a + suf, "rb").read() == open(b + suf, "rb").read()
    print(suf, "identical:", ok, flush=True)
