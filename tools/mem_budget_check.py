#!/usr/bin/env python
"""-m acceptance at scale (VERDICT r4 next #2): the full 525 MB bench
workload under -m2, byte-compared against a default -m run, with peak-RSS
accounting for both.  The budget must be BINDING: the -m2 plan must
actually shrink the store (fewer rows => real mid-run compactions/spills)
and the measured peak RSS must land under budget + runtime slack while
the default run's peak exceeds the -m2 cap.

CPU backend (device arrays are host RAM, so RSS accounts for the store
too).  Writes MEM_BUDGET.json.

Usage: python tools/mem_budget_check.py [--m N]
"""
from __future__ import annotations

import json
import resource
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "MEM_BUDGET.json"


WORKER = r"""
import os, sys, json, resource, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/kmc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, "/root/repo")
import kmc_tpu.ops.store as store_mod
from kmc_tpu.runner import count

fq, out, m = sys.argv[1], sys.argv[2], int(sys.argv[3])
caps = {}
real = store_mod.DeviceKmerStore

class Capture(real):
    def __init__(self, capacity_rows, **kw):
        caps["rows"] = capacity_rows
        caps["spill_budget"] = kw.get("spill_budget_bytes")
        super().__init__(capacity_rows, **kw)
        caps["store"] = self

    def spill(self):
        caps["spills"] = caps.get("spills", 0) + 1
        super().spill()

store_mod.DeviceKmerStore = Capture
t0 = time.perf_counter()
kw = {}
if m:
    kw["max_ram_gb"] = m
r1, r2 = count([fq], out, k=27, cutoff_min=2, batch_positions=1 << 20, **kw)
wall = time.perf_counter() - t0
st = caps.get("store")
print(json.dumps({
    "m": m,
    "store_rows": caps.get("rows"),
    "spill_budget_bytes": caps.get("spill_budget"),
    "n_spills": caps.get("spills", 0),
    "n_autocompacts": getattr(st, "n_autocompacts", None),
    "n_total": r2.n_total_kmers,
    "n_unique": r2.n_unique_kmers,
    "wall_s": round(wall, 1),
    "peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    // 1024,
}))
"""


def run(fq: str, out: str, m: int) -> dict:
    r = subprocess.run([sys.executable, "-c", WORKER, fq, out, str(m)],
                       capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise SystemExit(f"worker failed:\n{r.stdout}\n{r.stderr[-4000:]}")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    args = sys.argv[1:]
    m = int(args[args.index("--m") + 1]) if "--m" in args else 2

    sys.path.insert(0, str(REPO))
    import bench

    fq = str(bench.prepare_input())
    work = Path("/tmp/kmc_tpu_membudget")
    work.mkdir(exist_ok=True)

    rec_m = run(fq, str(work / "db_m"), m)
    print("budgeted:", json.dumps(rec_m), flush=True)
    rec_d = run(fq, str(work / "db_default"), 0)
    print("default: ", json.dumps(rec_d), flush=True)

    a = (Path(str(work / "db_m") + ".kmc_pre").read_bytes(),
         Path(str(work / "db_m") + ".kmc_suf").read_bytes())
    b = (Path(str(work / "db_default") + ".kmc_pre").read_bytes(),
         Path(str(work / "db_default") + ".kmc_suf").read_bytes())
    identical = a == b
    binding = rec_m["store_rows"] < rec_d["store_rows"]
    doc = {
        "workload": f"bench 525 MB FASTQ, k=27 ci=2 ({rec_m['n_total']} "
                    f"k-mers, {rec_m['n_unique']} unique)",
        "date": time.strftime("%Y-%m-%d"),
        "budgeted": rec_m,
        "default": rec_d,
        "db_bytes_identical": identical,
        "budget_binding_on_store": binding,
    }
    OUT.write_text(json.dumps(doc, indent=2) + "\n")
    print(f"db identical: {identical}  budget binding: {binding}")
    print(f"wrote {OUT}")
    if not (identical and binding):
        raise SystemExit(2)


if __name__ == "__main__":
    main()
