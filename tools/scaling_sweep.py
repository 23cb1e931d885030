#!/usr/bin/env python
"""Per-phase device-count scaling sweep of the sharded pipeline
(VERDICT r4 next #3): distributed_count at D = 1/2/4/8 on a virtual CPU
mesh, identical workload, phase timings recorded — the SHAPE evidence
(which phases scale ~1/D, what the exchange adds) behind the v5e-16
projection in docs/SCALING.md.  Absolute times are CPU-backend times;
the real-chip anchors come from tools/tpu_sharded_run.py.

Writes SCALING_SWEEP.json.

Usage: python tools/scaling_sweep.py [--reads N] [--len L]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/kmc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "SCALING_SWEEP.json"


def make_input(path: Path, n_reads: int, read_len: int) -> str:
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, 2_000_000)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n_reads):
            s = int(rng.integers(0, len(genome) - read_len))
            seq = lut[genome[s : s + read_len]].tobytes()
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * read_len))
    return str(path)


def main():
    args = sys.argv[1:]
    n_reads = int(args[args.index("--reads") + 1]) if "--reads" in args \
        else 120_000
    read_len = int(args[args.index("--len") + 1]) if "--len" in args else 150

    from kmc_tpu.parallel.distributed import make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    work = Path("/tmp/kmc_tpu_sweep")
    work.mkdir(exist_ok=True)
    fq = work / f"reads_{n_reads}_{read_len}.fastq"
    if not fq.exists():
        make_input(fq, n_reads, read_len)

    rows = []
    ref_db = None
    for D in (1, 2, 4, 8):
        mesh = make_mesh(D)
        out = str(work / f"db_d{D}")
        best = None
        for it in range(2):  # pass 0 warms compiles; report pass 1
            t0 = time.perf_counter()
            stats = distributed_count(
                [str(fq)], out, k=27, mesh=mesh, cutoff_min=2,
                batch_positions=1 << 16,
                capacity_rows_per_device=1 << 22,
                shard_input=False)
            wall = time.perf_counter() - t0
            best = (wall, stats)
        wall, stats = best
        db = (Path(out + ".kmc_pre").read_bytes(),
              Path(out + ".kmc_suf").read_bytes())
        if ref_db is None:
            ref_db = db
        ident = db == ref_db
        row = {
            "D": D,
            "wall_s": round(wall, 3),
            "db_identical_to_d1": ident,
            "n_total": stats["n_total"],
            "n_unique": stats["n_unique"],
            "timings": {k: round(v, 3)
                        for k, v in stats["timings"].items()},
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        assert ident, f"D={D} database differs from D=1"

    doc = {
        "workload": f"k=27 ci=2, {n_reads} x {read_len}bp reads "
                    f"({rows[0]['n_total']} k-mers, "
                    f"{rows[0]['n_unique']} unique)",
        "backend": "cpu virtual mesh (scaling SHAPE only; real-chip "
                   "anchors in TPU_SHARDED.json)",
        "date": time.strftime("%Y-%m-%d"),
        "sweep": rows,
    }
    OUT.write_text(json.dumps(doc, indent=2) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
