#!/usr/bin/env python
"""At-scale sharded counting check (VERDICT r3 next #5).

Pushes the full 525 MB bench read set (240 M bases, 208 M 27-mers)
through `distributed_count` on the 8-virtual-device CPU mesh with a
per-device capacity small enough to force REAL mid-run compactions and
host-RAM spills, then validates the database against the reference
binary (reference-side `kmc_tools transform sort` + `dump` byte-compare
— the same MATCH criterion as the multichip matrix), and repeats the
same workload as 2 jax.distributed processes x 4 devices with per-host
input sharding, byte-comparing that DB against the single-process one.

    python tools/at_scale_sharded_check.py [--small]

Writes a summary row (for SCALING.md) to stdout.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.measure_reference import build_reference  # noqa: E402

K = 27
CI = 2


def run(cmd, **kw):
    return subprocess.run([str(c) for c in cmd], check=True,
                          capture_output=True, **kw)


def ref_sorted_dump(kmc_tools, db, workdir, tag):
    out = workdir / f"{tag}.dump"
    run([kmc_tools, "-t1", "transform", db, "sort", str(db) + ".s"])
    run([kmc_tools, "-t1", "transform", str(db) + ".s", "dump", out])
    return out


def main():
    small = "--small" in sys.argv
    if small:
        os.environ["KMC_TPU_BENCH_GENOME"] = str(1 << 20)
    import bench

    fq = bench.prepare_input()
    size_mb = Path(fq).stat().st_size / 1e6
    workdir = Path(tempfile.mkdtemp(prefix="kmc_scale_shard_"))
    kmc = build_reference(Path(tempfile.gettempdir()))
    kmc_tools = kmc.parent / "kmc_tools"

    # reference DB on the same input
    tmp = workdir / "tmp"
    tmp.mkdir()
    t0 = time.perf_counter()
    run([kmc, f"-k{K}", f"-ci{CI}", "-t1", fq, workdir / "refdb", tmp])
    t_ref = time.perf_counter() - t0

    # sharded single-process run over the 8-device mesh; capacity chosen
    # so each device's partition overflows repeatedly (compaction) and the
    # compacted unique set itself overflows (spill)
    from kmc_tpu.parallel.distributed import make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    cap = 1 << (18 if small else 22)
    batch = 1 << (14 if small else 20)
    t0 = time.perf_counter()
    stats = distributed_count(
        [str(fq)], str(workdir / "shdb"), k=K, mesh=make_mesh(8),
        cutoff_min=CI, batch_positions=batch,
        capacity_rows_per_device=cap,
    )
    t_sh = time.perf_counter() - t0
    print(f"sharded 8-dev CPU mesh: {t_sh:.1f}s  "
          f"n_total={stats['n_total']} n_unique={stats['n_unique']} "
          f"compactions={stats['n_compactions']} spills={stats['n_spills']}",
          flush=True)
    assert stats["n_compactions"] > 0, "capacity never forced compaction"
    assert stats["n_spills"] > 0, "capacity never forced a spill"

    # MATCH criterion: reference binary reads BOTH databases; sorted dumps
    # byte-identical
    d_ref = ref_sorted_dump(kmc_tools, workdir / "refdb", workdir, "ref")
    d_sh = ref_sorted_dump(kmc_tools, workdir / "shdb", workdir, "sh")
    match = d_ref.read_bytes() == d_sh.read_bytes()
    print(f"sharded-vs-reference sorted dump: "
          f"{'MATCH' if match else 'MISMATCH'}", flush=True)
    assert match

    # 2-process x 4-device variant with per-host input sharding
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(MP_K=str(K), MP_CI=str(CI), MP_BATCH=str(batch),
               MP_CAPACITY=str(cap), MP_MIN_SHARD=str(32 << 20))
    worker = Path(__file__).resolve().parent.parent / "tests" / \
        "multiproc_worker.py"
    out2 = workdir / "mpdb"
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), f"localhost:{port}", "2",
             str(pid), str(fq), str(out2)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    for p in procs:
        so, _ = p.communicate(timeout=7200)
        assert p.returncode == 0, so.decode(errors="replace")[-3000:]
    t_mp = time.perf_counter() - t0
    with open(str(out2) + ".stats.0") as f:
        s0 = json.load(f)
    id_ok = all(
        Path(str(out2) + suf).read_bytes()
        == Path(str(workdir / "shdb") + suf).read_bytes()
        for suf in (".kmc_pre", ".kmc_suf"))
    print(f"2-process sharded-input: {t_mp:.1f}s  "
          f"consumed_local(p0)={s0['consumed_bytes_local']}  "
          f"DB bytes vs single-process: "
          f"{'MATCH' if id_ok else 'MISMATCH'}", flush=True)
    assert id_ok

    print(json.dumps({
        "workload": f"{size_mb:.0f} MB FASTQ, k={K} ci={CI}",
        "mesh": "8 virtual CPU devices",
        "capacity_rows_per_device": cap,
        "n_total": stats["n_total"],
        "n_unique": stats["n_unique"],
        "n_compactions": stats["n_compactions"],
        "n_spills": stats["n_spills"],
        "sharded_wall_s": round(t_sh, 1),
        "two_process_wall_s": round(t_mp, 1),
        "ref_t1_wall_s": round(t_ref, 1),
        "ref_dump_match": match,
        "two_process_db_identical": id_ok,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
