"""Worker process for the multi-host distributed_count test: one of N
jax.distributed processes, each owning 4 virtual CPU devices.  Invoked by
tests/test_multiprocess.py as

    python multiproc_worker.py <coordinator> <n_procs> <pid> <reads> <out>

Process 0 writes the KMC2 database; every process writes <out>.stats.<pid>
(JSON) so the launcher can check agreement."""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coordinator, n_procs, pid, reads, out = sys.argv[1:6]
    from kmc_tpu.parallel.distributed import init_multihost, make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    hb = os.environ.get("MP_HEARTBEAT_SECS")
    init_multihost(coordinator_address=coordinator,
                   num_processes=int(n_procs), process_id=int(pid),
                   heartbeat_timeout_seconds=int(hb) if hb else None)
    assert jax.process_count() == int(n_procs), jax.process_count()
    assert len(jax.devices()) == 4 * int(n_procs)

    # fault injection (tests/test_fault_injection.py): this process dies
    # abruptly mid-run, the survivors must error out within the heartbeat
    # window instead of hanging the lockstep allgather
    crash = os.environ.get("MP_CRASH_SECS")
    if crash and int(pid) == int(os.environ.get("MP_CRASH_PID", "1")):
        import threading

        threading.Timer(float(crash), lambda: os._exit(17)).start()

    mesh = make_mesh()
    cap = int(os.environ.get("MP_CAPACITY", 1 << 12))
    stats = distributed_count(
        [reads], out,
        k=int(os.environ.get("MP_K", 25)),
        mesh=mesh,
        batch_positions=int(os.environ.get("MP_BATCH", 1 << 10)),
        cutoff_min=int(os.environ.get("MP_CI", 1)),
        capacity_rows_per_device=cap,
        shard_input=os.environ.get("MP_SHARD_INPUT", "1") != "0",
        min_shard_bytes=int(os.environ.get("MP_MIN_SHARD", 32 << 20)),
    )
    with open(f"{out}.stats.{pid}", "w") as f:
        json.dump(stats, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
