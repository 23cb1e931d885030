"""Fault injection for the threaded and distributed paths (VERDICT r4
missing #6 / next #7): a failing component must surface a clean exception
within a bounded time — never hang the pipeline.  Reference analogue: the
cooperative cancellation of critical_error_handler.h:9-80 (every worker
observes the error flag and unwinds; exceptions are collected per thread).
"""
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from util import random_reads, write_fastq

HERE = os.path.dirname(__file__)


# ---- parser threads ----

def test_corrupt_gz_mid_stream_raises(tmp_path):
    """A parser thread hitting a corrupt .gz mid-stream must propagate
    the error to the consumer (no hang, no silent truncation)."""
    from kmc_tpu.io import readers
    from kmc_tpu.io.native import get_lib

    if get_lib() is None:
        pytest.skip("native parser unavailable")
    paths = []
    for i in range(3):
        reads = random_reads(50, 90, seed=i)
        paths.append(str(write_fastq(tmp_path / f"g{i}.fastq", reads)))
    import gzip

    bad = tmp_path / "bad.fastq.gz"
    good_gz = gzip.compress(open(paths[1], "rb").read())
    bad.write_bytes(good_gz[: len(good_gz) // 2]
                    + b"\x00garbage\xff" * 200)
    ordered = [paths[0], str(bad), paths[2]]
    t0 = time.monotonic()
    with pytest.raises(OSError):
        for _ in readers.parallel_code_stream(ordered, "fastq",
                                              n_threads=3):
            pass
    assert time.monotonic() - t0 < 60, "error took too long to surface"


def test_parser_exception_does_not_hang_consumer(tmp_path, monkeypatch):
    """An arbitrary exception inside a reader thread (not just IO errors)
    unwinds through the queue protocol."""
    from kmc_tpu.io import native, readers
    from kmc_tpu.io.native import get_lib

    if get_lib() is None:
        pytest.skip("native parser unavailable")
    paths = [str(write_fastq(tmp_path / f"h{i}.fastq",
                             random_reads(2000, 90, seed=i)))
             for i in range(4)]

    calls = []
    real_parse = native.NativeParser.parse

    def exploding(self, buf):
        calls.append(1)
        if len(calls) == 2:
            raise RuntimeError("injected parser fault")
        return real_parse(self, buf)

    monkeypatch.setattr(native.NativeParser, "parse", exploding)
    monkeypatch.setattr(readers, "CHUNK_BYTES", 1 << 12)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="injected parser fault"):
        for _ in readers.parallel_code_stream(paths, "fastq", n_threads=3):
            pass
    assert time.monotonic() - t0 < 60


def test_runner_propagates_reader_fault(tmp_path):
    """End-to-end: count() over a corrupt input raises instead of
    writing a wrong database."""
    from kmc_tpu.runner import count

    import gzip

    reads = random_reads(100, 90, seed=7)
    plain = write_fastq(tmp_path / "ok.fastq", reads)
    gz = tmp_path / "broken.fastq.gz"
    blob = gzip.compress(open(plain, "rb").read())
    gz.write_bytes(blob[: len(blob) - 40])  # truncated member
    with pytest.raises(Exception):
        count([str(gz)], str(tmp_path / "out"), k=25, cutoff_min=1,
              batch_positions=1 << 12)
    assert not (tmp_path / "out.kmc_pre").exists()


# ---- checkpoint / spill-file integrity ----

def test_truncated_checkpoint_raises_cleanly(tmp_path):
    """Resume from a truncated stage-1 checkpoint must raise, not feed
    garbage rows into stage 2 (reference: tmp-file integrity is implicit
    in its reader loops; ours is the npz container check)."""
    from kmc_tpu.runner import Runner, Stage1Params

    reads = random_reads(200, 90, seed=3)
    fq = write_fastq(tmp_path / "c.fastq", reads)
    r = Runner()
    p1 = Stage1Params(input_files=[str(fq)], kmer_len=21,
                      batch_positions=1 << 12)
    r.run_stage1(p1)
    ck = str(tmp_path / "ck")
    r.save_stage1_checkpoint(ck)
    path = next(tmp_path.glob("ck*"))
    blob = path.read_bytes()
    path.write_bytes(blob[: len(blob) // 2])
    r2 = Runner()
    with pytest.raises(Exception):
        r2.resume_stage1_checkpoint(str(path).replace(".npz", ""), p1)


# ---- distributed peer death ----

def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_peer_death_fails_survivor_within_heartbeat(tmp_path):
    """One of two jax.distributed processes dies abruptly mid-run; the
    survivor's lockstep allgather must FAIL within the heartbeat window
    (here 10 s) rather than hang — the distributed form of the
    reference's cancellation contract."""
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 60_000)
    fq = tmp_path / "big.fastq"
    with open(fq, "w") as f:
        for i in range(6000):
            start = rng.integers(0, len(genome) - 130)
            seq = "".join("ACGT"[c] for c in genome[start : start + 130])
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({
        "MP_HEARTBEAT_SECS": "10",
        "MP_CRASH_SECS": "2.0",
        "MP_CRASH_PID": "1",
        "MP_BATCH": str(1 << 9),   # many lockstep groups: crash lands mid-run
        "MP_CAPACITY": str(1 << 12),
    })
    out = str(tmp_path / "fi_db")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
             f"localhost:{port}", "2", str(pid), str(fq), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    t0 = time.monotonic()
    outs, codes = [], []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=240)
            outs.append(stdout.decode(errors="replace"))
            codes.append(p.returncode)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        pytest.fail("survivor hung past the failure-detection bound")
    wall = time.monotonic() - t0
    assert codes[1] == 17, f"crasher exited {codes[1]}:\n{outs[1][-2000:]}"
    assert codes[0] not in (0, None), (
        f"survivor claimed success after peer death:\n{outs[0][-2000:]}")
    # detection bound: crash (2 s) + heartbeat window (10 s) + margin
    assert wall < 180, f"took {wall:.0f}s to fail"
