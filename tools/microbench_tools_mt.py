#!/usr/bin/env python
"""Thread-scaling microbench of the chunk-parallel native tools core
(VERDICT r3 next #2).

The reference's kmc_tools runs its KMC2 merge and set ops across -t
threads (kmc_tools/kmc2_db_reader.h:400-560); the native core's
equivalent splits the sorted key space at LUT-prefix boundaries into
~6*T chunks merged by a worker pool with an ordered drain
(native/kmc_stream.cpp::run_chunked).  This harness fabricates large
KMC2 databases and times sort/union/dump at t=1/2/4/8, verifying every
output byte-identical to the serial path.

On a 1-core host (this container) wall time is expected FLAT — the
measurement proves byte-identity and bounded overhead under
oversubscription; the scaling claim needs a multi-core box, where the
same harness reports the speedup.

Usage: python tools/microbench_tools_mt.py [n_records]
"""
from __future__ import annotations

import hashlib
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def fabricate(tmp, tag, k, lpl, n_bins, n, rng, frac=1.0):
    from test_native_tools import _random_records, _write_kmc2

    kmers, counts = _random_records(rng, k, n)
    m = rng.random(len(kmers)) < frac
    path = tmp / tag
    _write_kmc2(path, k, kmers[m], counts[m], lpl, n_bins, rng)
    return str(path)


def sha(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            h.update(b)
    return h.hexdigest()[:16]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    import os

    from kmc_tpu.tools import db_ops, native_tools

    if native_tools.get_lib() is None:
        print("native tools unavailable")
        return 1
    tmp = Path(tempfile.mkdtemp(prefix="kmc_mt_"))
    rng = np.random.default_rng(7)
    k, lpl, n_bins = 27, 7, 512
    print(f"fabricating 2 KMC2 DBs (~{n} records each, {n_bins} bins, "
          f"k={k}) ...", flush=True)
    a = fabricate(tmp, "a", k, lpl, n_bins, int(n * 1.2), rng, 0.85)
    b = fabricate(tmp, "b", k, lpl, n_bins, int(n * 1.2), rng, 0.85)
    print(f"host cores: {os.cpu_count()}")

    # threaded RA lookup case: the span-fanned binned lookup behind
    # GetCountersForRead / the read filter (kst_counters_for_seq_binned)
    from kmc_tpu.api import KMCFile

    ra = KMCFile()
    assert ra.OpenForRA(a)
    q_seq = "".join("ACGTN"[i] for i in rng.integers(0, 5, 24_000_000))

    def ra_lookup(o):
        ok, c = ra.counters_for_read_array(q_seq)
        assert ok
        with open(o + ".txt", "wb") as f:
            f.write(np.asarray(c).tobytes())

    cases = [
        ("sort", lambda o: db_ops.transform_sort(a, o),
         (".kmc_pre", ".kmc_suf")),
        ("union", lambda o: db_ops.run_simple_op("union", a, b, o),
         (".kmc_pre", ".kmc_suf")),
        ("dump -s", lambda o: db_ops.transform_dump(a, o + ".txt",
                                                    sorted_output=True),
         (".txt",)),
        ("ra_lookup", ra_lookup, (".txt",)),
    ]
    base_hash = {}
    rows = []
    for t in (1, 2, 4, 8):
        native_tools.set_threads(t)
        for name, fn, sufs in cases:
            out = str(tmp / f"{name.split()[0]}_t{t}")
            t0 = time.perf_counter()
            fn(out)
            dt = time.perf_counter() - t0
            hs = tuple(sha(out + s) for s in sufs)
            if t == 1:
                base_hash[name] = hs
                ok = True
            else:
                ok = hs == base_hash[name]
            rows.append((name, t, dt, ok))
            print(f"{name:8s} t={t}  {dt:7.2f}s  "
                  f"{'MATCH' if ok else 'DIFF'}", flush=True)
    native_tools.set_threads(1)
    bad = [r for r in rows if not r[3]]
    print(f"\n{len(rows)} runs, {len(bad)} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
