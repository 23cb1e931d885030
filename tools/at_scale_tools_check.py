#!/usr/bin/env python
"""At-scale streaming-tools proof (VERDICT r2 next #8): a >=100 M-record
union + dump through the native streamed core, byte-compared against the
reference kmc_tools binary, with our side running under a BINDING
RLIMIT_AS cap (the in-memory path would need gigabytes; the native core
preads through fixed buffers).

Workload: a fabricated 512-bin KMC2 database A (~110 M unique 27-mers,
2-byte counters — the shape kmc produces) and a KMC1 database B (~70 M
records, half overlapping A).  Both are written with the byte-compatible
kmc_tpu writers and are read by the reference binary itself, so the
fabrication cannot drift from the real format.

Usage: python tools/at_scale_tools_check.py [n_a_millions=110]
"""
from __future__ import annotations

import os
import resource
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

K = 27
LPL = 7
CS = 2
AS_CAP = 1 << 30  # 1 GiB address-space cap for our side


def keys_to_kmer_bytes(keys: np.ndarray) -> np.ndarray:
    kb = (K + 3) // 4
    out = np.empty((len(keys), kb), np.uint8)
    v = keys.copy()
    for j in range(kb - 1, -1, -1):
        out[:, j] = (v & np.uint64(0xFF)).astype(np.uint8)
        v >>= np.uint64(8)
    return out


def fabricate(rng, n, from_keys=None, frac=0.5):
    """Sorted unique u(2k)-bit keys; optionally `frac` sampled from an
    existing key set (overlap) and the rest fresh."""
    space = np.uint64(1 << (2 * K))
    if from_keys is None:
        keys = rng.integers(0, 1 << (2 * K), n, dtype=np.uint64)
    else:
        n_old = int(n * frac)
        old = rng.choice(from_keys, n_old, replace=False)
        fresh = rng.integers(0, 1 << (2 * K), n - n_old, dtype=np.uint64)
        keys = np.concatenate([old, fresh])
    keys = np.unique(keys)  # sorted
    assert keys[-1] < space
    counts = rng.integers(1, 1000, len(keys)).astype(np.uint32)
    return keys, counts


def write_kmc2(path, keys, counts, n_bins, rng):
    from kmc_tpu.formats.kmc_db import DbInfo, Kmc2DbWriter

    bins = rng.integers(0, n_bins, len(keys)).astype(np.int32)
    order = np.argsort(bins, kind="stable")  # (bin, key) order
    info = DbInfo(kmer_len=K, counter_size=CS, lut_prefix_len=LPL,
                  signature_len=9, cutoff_min=1, cutoff_max=10**9,
                  both_strands=True, n_bins=n_bins)
    sig_map = (np.arange((1 << 18) + 1) % n_bins).astype(np.int32)
    w = Kmc2DbWriter(str(path), info, sig_map)
    w.n_unique = len(keys)
    w.n_total = int(counts.sum())
    w.write_all(bins[order], keys_to_kmer_bytes(keys[order]),
                counts[order])
    w.close()


def write_kmc1(path, keys, counts):
    from kmc_tpu.formats.kmc_db import DbInfo, write_kmc1_db

    info = DbInfo(kmer_len=K, counter_size=CS, lut_prefix_len=LPL,
                  cutoff_min=1, cutoff_max=10**9, both_strands=True,
                  version=0)
    write_kmc1_db(str(path), info, keys_to_kmer_bytes(keys), counts)


def run_ref(kmc_tools, args):
    os.sync()  # settle prior writeback so timings don't cross-contaminate
    t0 = time.perf_counter()
    subprocess.run([str(kmc_tools), "-t1", *args], check=True,
                   capture_output=True)
    return time.perf_counter() - t0


def run_ours_capped(code: str) -> float:
    """Run our tools code in a subprocess under the AS cap."""
    script = f"""
import resource, sys, os
resource.setrlimit(resource.RLIMIT_AS, ({AS_CAP}, {AS_CAP}))
os.environ["KMC_TPU_NO_JAX"] = "1"
sys.path.insert(0, "/root/repo")
import time
t0 = time.perf_counter()
{code}
print("WALL", time.perf_counter() - t0)
"""
    os.sync()  # settle prior writeback so timings don't cross-contaminate
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True)
    if r.returncode != 0:
        print(r.stdout + r.stderr)
        raise SystemExit("capped run failed")
    # subtract the interpreter+import startup: the inner script prints its
    # own wall (the tools work itself)
    for line in r.stdout.splitlines():
        if line.startswith("WALL "):
            return float(line.split()[1])
    return time.perf_counter() - t0


def main():
    n_a = int(sys.argv[1]) * 10**6 if len(sys.argv) > 1 else 110 * 10**6
    from tools.measure_reference import build_reference

    kmc = build_reference(Path("/tmp"))
    kmc_tools = kmc.parent / "kmc_tools"
    work = Path("/tmp/kmc_at_scale_tools")
    work.mkdir(exist_ok=True)
    rng = np.random.default_rng(42)

    t0 = time.perf_counter()
    keys_a, counts_a = fabricate(rng, n_a)
    A = work / "A"
    write_kmc2(A, keys_a, counts_a, 512, rng)
    keys_b, counts_b = fabricate(rng, int(n_a * 0.64), from_keys=keys_a)
    B = work / "B"
    write_kmc1(B, keys_b, counts_b)
    size_a = (A.with_suffix(".kmc_suf").stat().st_size
              if A.with_suffix(".kmc_suf").exists()
              else Path(str(A) + ".kmc_suf").stat().st_size)
    print(f"fabricated A={len(keys_a):,} records (KMC2, 512 bins, "
          f"{size_a/1e9:.2f} GB suffix), B={len(keys_b):,} (KMC1) in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    del keys_a, counts_a, keys_b, counts_b

    # union: reference vs ours (ours under the 1 GiB AS cap)
    refU, ourU = work / "refU", work / "ourU"
    t_ref_u = run_ref(kmc_tools, ["simple", str(A), str(B), "union",
                                  str(refU)])
    t_our_u = run_ours_capped(
        f"from kmc_tpu.tools.db_ops import run_simple_op\n"
        f"from kmc_tpu.tools import native_tools\n"
        f"assert native_tools.get_lib() is not None\n"
        f"n = run_simple_op('union', {str(A)!r}, {str(B)!r}, {str(ourU)!r})\n"
        f"print('records:', n)")
    same_u = all(
        open(str(refU) + s, "rb").read() == open(str(ourU) + s, "rb").read()
        for s in (".kmc_pre", ".kmc_suf"))
    print(f"union: ref {t_ref_u:.1f}s  ours(capped) {t_our_u:.1f}s  "
          f"ratio {t_ref_u/t_our_u:.2f}x  DB bytes "
          f"{'MATCH' if same_u else 'MISMATCH'}", flush=True)

    # sorted dump of A (>=100 M records) — text byte compare
    refD, ourD = work / "ref.dump", work / "our.dump"
    t_ref_d = run_ref(kmc_tools, ["transform", str(A), "dump", "-s",
                                  str(refD)])
    t_our_d = run_ours_capped(
        f"from kmc_tpu.tools.db_ops import transform_dump\n"
        f"transform_dump({str(A)!r}, {str(refD.parent / 'our.dump')!r}, "
        f"True)")
    same_d = (refD.stat().st_size == ourD.stat().st_size
              and subprocess.run(["cmp", "-s", str(refD), str(ourD)])
              .returncode == 0)
    print(f"dump : ref {t_ref_d:.1f}s  ours(capped) {t_our_d:.1f}s  "
          f"ratio {t_ref_d/t_our_d:.2f}x  text bytes "
          f"{'MATCH' if same_d else 'MISMATCH'}", flush=True)
    ok = same_u and same_d
    print(f"at-scale tools: {'ALL MATCH' if ok else 'FAILURES'} "
          f"(AS cap {AS_CAP >> 20} MiB on our side)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()


