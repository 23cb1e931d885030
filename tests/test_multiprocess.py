"""True multi-host execution: 2 jax.distributed processes x 4 virtual CPU
devices each, one global 8-device mesh — the CPU stand-in for a multi-host
TPU pod (SURVEY.md §2.6 / §4).  The DB written by process 0 must be
byte-identical to the single-process result and match the oracle."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def reads_file(tmp_path_factory):
    rng = np.random.default_rng(11)
    path = tmp_path_factory.mktemp("mp") / "reads.fastq"
    genome = rng.integers(0, 4, 30000)
    with open(path, "w") as f:
        for i in range(500):
            start = rng.integers(0, len(genome) - 130)
            seq = "".join("ACGT"[c] for c in genome[start : start + 130])
            if i % 40 == 3:
                seq = seq[:60] + "N" + seq[61:]
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    return str(path)


def _run_workers(n_procs, reads, out, timeout=600, env_extra=None):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.update(env_extra or {})
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
             f"localhost:{port}", str(n_procs), str(pid), reads, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"
    return outs


def test_two_process_count_matches_single(reads_file, tmp_path):
    from kmc_tpu import oracle
    from kmc_tpu.formats import dump_db_file

    out = str(tmp_path / "mp_db")
    _run_workers(2, reads_file, out)

    # both processes agree on the global stats (per-process parse
    # accounting fields naturally differ under input sharding)
    with open(out + ".stats.0") as f:
        s0 = json.load(f)
    with open(out + ".stats.1") as f:
        s1 = json.load(f)
    local = ("n_reads_local", "consumed_bytes_local", "timings")
    assert {k: v for k, v in s0.items() if k not in local} == \
           {k: v for k, v in s1.items() if k not in local}
    assert s0["n_processes"] == 2
    assert s0["n_devices"] == 8

    # dump matches the oracle
    records, ostats = oracle.oracle_count_file(reads_file, 25, "fastq",
                                               cutoff_min=1)
    assert dump_db_file(out) == oracle.dump_text(records)
    assert s0["n_unique"] == ostats["n_unique"]
    assert s0["n_total"] == ostats["n_total"]

    # byte-identical to the single-process multi-chip DB on the same mesh
    # size (8 devices)
    from kmc_tpu.parallel.distributed import make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    ref_out = str(tmp_path / "sp_db")
    distributed_count([reads_file], ref_out, k=25, mesh=make_mesh(8),
                      batch_positions=1 << 10, cutoff_min=1,
                      capacity_rows_per_device=1 << 12)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out + suf, "rb") as a, open(ref_out + suf, "rb") as b:
            assert a.read() == b.read(), suf


def test_two_process_sharded_input_exact(reads_file, tmp_path):
    """Per-host input sharding (VERDICT r2 missing #1): with a tiny
    min_shard_bytes the input file genuinely splits, each process parses a
    DISJOINT byte-range shard, and the DB must still be byte-identical to
    the single-process run — including the header's exact n_total and the
    ppermute-carried super-k-mer stats, now under per-host carry rings."""
    from kmc_tpu import oracle
    from kmc_tpu.formats import dump_db_file
    from kmc_tpu.io.readers import process_input_shards

    # precondition: the shard planner actually splits this file in two+
    parts = process_input_shards([reads_file], "fastq", 2,
                                 min_shard_bytes=4096)
    assert all(parts), [len(p) for p in parts]

    out = str(tmp_path / "mp_shard_db")
    _run_workers(2, reads_file, out,
                 env_extra={"MP_MIN_SHARD": "4096"})

    with open(out + ".stats.0") as f:
        s0 = json.load(f)
    with open(out + ".stats.1") as f:
        s1 = json.load(f)
    local = ("n_reads_local", "consumed_bytes_local", "timings")
    assert {k: v for k, v in s0.items() if k not in local} == \
           {k: v for k, v in s1.items() if k not in local}
    # disjoint coverage: each byte parsed exactly once fleet-wide, and
    # BOTH processes parsed a real piece
    assert (s0["consumed_bytes_local"] + s1["consumed_bytes_local"]
            == os.path.getsize(reads_file))
    assert s0["consumed_bytes_local"] > 0 and s1["consumed_bytes_local"] > 0
    assert s0["n_reads_local"] + s1["n_reads_local"] == 500

    records, ostats = oracle.oracle_count_file(reads_file, 25, "fastq",
                                               cutoff_min=1)
    assert dump_db_file(out) == oracle.dump_text(records)
    assert s0["n_total"] == ostats["n_total"]
    assert s0["n_reads"] == 500

    from kmc_tpu.parallel.distributed import make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    ref_out = str(tmp_path / "sp_shard_db")
    sp = distributed_count([reads_file], ref_out, k=25, mesh=make_mesh(8),
                           batch_positions=1 << 10, cutoff_min=1,
                           capacity_rows_per_device=1 << 12)
    # exact super-k-mer stats under genuinely different per-host streams
    assert s0["n_super_kmers"] == sp["n_super_kmers"]
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out + suf, "rb") as a, open(ref_out + suf, "rb") as b:
            assert a.read() == b.read(), suf


def test_two_process_compaction_and_spill(reads_file, tmp_path):
    """Multi-process + per-device overflow: compaction and spill run with
    process_allgather coordination; the DB must still match the oracle and
    the single-process run byte-for-byte."""
    from kmc_tpu import oracle
    from kmc_tpu.formats import dump_db_file

    out = str(tmp_path / "mp_spill_db")
    env_extra = {"MP_CAPACITY": str(1 << 11)}  # tiny: forces compact+spill
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
             f"localhost:{port}", "2", str(pid), reads_file, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, stdout.decode(errors="replace")[-4000:]

    records, ostats = oracle.oracle_count_file(reads_file, 25, "fastq",
                                               cutoff_min=1)
    assert dump_db_file(out) == oracle.dump_text(records)

    from kmc_tpu.parallel.distributed import make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    ref_out = str(tmp_path / "sp_spill_db")
    distributed_count([reads_file], ref_out, k=25, mesh=make_mesh(8),
                      batch_positions=1 << 10, cutoff_min=1,
                      capacity_rows_per_device=1 << 11)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out + suf, "rb") as a, open(ref_out + suf, "rb") as b:
            assert a.read() == b.read(), suf


def test_three_process_byte_identical(reads_file, tmp_path):
    """3 processes x 4 devices vs 1 process: DB bytes identical.  A
    third shard adds stream-tail/dealing alignments two processes cannot
    produce — this exact check caught the BatchStream tail-interval
    window loss (round 5)."""
    out1 = str(tmp_path / "p1")
    _run_workers(1, reads_file, out1, env_extra={"MP_MIN_SHARD": "4096"})
    out3 = str(tmp_path / "p3")
    _run_workers(3, reads_file, out3, env_extra={"MP_MIN_SHARD": "4096"})
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out1 + suf, "rb") as a, open(out3 + suf, "rb") as b:
            assert a.read() == b.read(), suf
