"""Worker for tools/measure_multiprocess.py: one of N jax.distributed
processes over D/N virtual CPU devices each, running distributed_count on
a shared input at measurement scale.

    python multiproc_bench_worker.py <coordinator> <n_procs> <pid> \
        <devices_per_proc> <reads> <out> <k> <batch_positions> <capacity>

Process 0 writes the database; every process writes <out>.stats.<pid> with
the stats dict plus wall-clock phase times.
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={sys.argv[4]}"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coordinator, n_procs, pid, _dpp, reads, out, k, bp, cap = sys.argv[1:10]
    from kmc_tpu.parallel.distributed import init_multihost, make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    t0 = time.perf_counter()
    init_multihost(coordinator_address=coordinator,
                   num_processes=int(n_procs), process_id=int(pid))
    mesh = make_mesh()
    t_init = time.perf_counter() - t0

    t0 = time.perf_counter()
    stats = distributed_count(
        [reads], out, k=int(k), mesh=mesh, batch_positions=int(bp),
        cutoff_min=1, capacity_rows_per_device=int(cap),
        min_shard_bytes=4 << 20,  # bench inputs are tens of MB: still shard
    )
    stats["t_init_s"] = round(t_init, 2)
    stats["t_count_s"] = round(time.perf_counter() - t0, 2)
    with open(f"{out}.stats.{pid}", "w") as f:
        json.dump(stats, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
