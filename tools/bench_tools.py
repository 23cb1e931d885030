#!/usr/bin/env python
"""Head-to-head kmc_tools manipulation benchmark vs the reference binary.

The KMC3 paper's headline covers counting AND manipulation performance;
this harness times the kmc_tpu tools surface against the reference
kmc_tools binary on the same databases (the bench.py counting DB by
default), byte-verifying every output pair it times.

Usage: python tools/bench_tools.py [--scale N] [--ops dump,union,...]
"""
from __future__ import annotations

import argparse
import filecmp
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.measure_reference import build_reference  # noqa: E402


def run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, **kw)


def t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def our_tools(args):
    # in-process: a subprocess would charge ~2s of the image's
    # sitecustomize (it imports jax into EVERY python process) to each op;
    # that cost is this image's, not the tools'.  The reference binary's
    # process startup is ~5 ms and stays included on its side.
    from kmc_tpu.tools_cli import main

    assert main([str(a) for a in args]) == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/tmp/kmc_tpu_bench/bench_out",
                    help="existing KMC DB prefix (default: bench.py output)")
    ap.add_argument("--ops", default="dump,histogram,sort,union,intersect,"
                    "kmers_subtract,counters_subtract,compact,reduce,"
                    "kff_dump,kff_union,okff_sort,complex,"
                    "filter,filter55,filter127,filter_trim,filter_hm")
    ap.add_argument("--stream", action="store_true",
                    help="force the kmc_tpu streaming path (KMC_TPU_STREAM_THRESHOLD=0)")
    args = ap.parse_args()

    kmc = build_reference(Path(tempfile.gettempdir()))
    ref_tools = kmc.parent / "kmc_tools"
    if not ref_tools.exists():
        run(["make", "-j1", "kmc_tools"], cwd=kmc.parent.parent)

    db = args.db
    if not Path(db + ".kmc_pre").exists():
        print(f"DB {db} missing — run bench.py first", file=sys.stderr)
        return 1

    if args.stream:
        os.environ["KMC_TPU_STREAM_THRESHOLD"] = "0"

    work = Path(tempfile.mkdtemp(prefix="kmc_bench_tools_"))
    ops = args.ops.split(",")

    # second operand for set ops: reduce of the DB at ci3 (distinct but
    # heavily overlapping k-mer set)
    db2 = str(work / "db2")
    if any(o in ops for o in ("union", "intersect", "kmers_subtract",
                              "counters_subtract", "kff_union", "complex")):
        run([str(ref_tools), "-t1", "transform", db, "-ci3", "reduce", db2])
    # KFF-format copy of the DB for the KFF-input rows (reference-produced)
    kffdb = str(work / "dbk")
    if any(o.startswith("kff_") for o in ops):
        run([str(ref_tools), "-t1", "transform", db, "sort", kffdb,
             "-okff"])
        kffdb += ".kff"

    rows = []

    def bench(name, ref_cmd, our_cli, outs):
        r = t(lambda: run(ref_cmd))
        o = t(lambda: our_tools(our_cli))
        ok = all(
            filecmp.cmp(str(a), str(b), shallow=False)
            for a, b in outs
        )
        rows.append((name, r, o, ok))
        print(f"{name:18s} ref {r:7.2f}s  kmc_tpu {o:7.2f}s  "
              f"ratio {r / o if o else 0:5.2f}x  {'MATCH' if ok else 'DIFF'}",
              flush=True)

    for op in ops:
        if op == "dump":
            a, b = work / "ref.dump", work / "our.dump"
            bench("transform dump",
                  [str(ref_tools), "-t1", "transform", db, "dump", "-s", str(a)],
                  ["transform", db, "dump", "-s", str(b)],
                  [(a, b)])
        elif op == "histogram":
            a, b = work / "ref.hist", work / "our.hist"
            bench("histogram",
                  [str(ref_tools), "-t1", "transform", db, "histogram", str(a)],
                  ["transform", db, "histogram", str(b)],
                  [(a, b)])
        elif op == "sort":
            a, b = work / "ref_sort", work / "our_sort"
            bench("transform sort",
                  [str(ref_tools), "-t1", "transform", db, "sort", str(a)],
                  ["transform", db, "sort", str(b)],
                  [(str(a) + s, str(b) + s) for s in (".kmc_pre", ".kmc_suf")])
        elif op == "reduce":
            a, b = work / "ref_red", work / "our_red"
            bench("transform reduce",
                  [str(ref_tools), "-t1", "transform", db, "-ci3", "reduce", str(a)],
                  ["transform", db, "-ci3", "reduce", str(b)],
                  [(str(a) + s, str(b) + s) for s in (".kmc_pre", ".kmc_suf")])
        elif op == "compact":
            a, b = work / "ref_cp", work / "our_cp"
            bench("transform compact",
                  [str(ref_tools), "-t1", "transform", db, "compact", str(a)],
                  ["transform", db, "compact", str(b)],
                  [(str(a) + s, str(b) + s) for s in (".kmc_pre", ".kmc_suf")])
        elif op in ("union", "intersect", "kmers_subtract",
                    "counters_subtract"):
            a, b = work / f"ref_{op}", work / f"our_{op}"
            bench(f"simple {op}",
                  [str(ref_tools), "-t1", "simple", db, db2, op, str(a)],
                  ["simple", db, db2, op, str(b)],
                  [(str(a) + s, str(b) + s) for s in (".kmc_pre", ".kmc_suf")])
        elif op == "kff_dump":
            a, b = work / "ref_kff.dump", work / "our_kff.dump"
            bench("dump (KFF input)",
                  [str(ref_tools), "-t1", "transform", kffdb, "dump", "-s",
                   str(a)],
                  ["transform", kffdb, "dump", "-s", str(b)],
                  [(a, b)])
        elif op == "kff_union":
            a, b = work / "ref_ku", work / "our_ku"
            bench("union (KFF operand)",
                  [str(ref_tools), "-t1", "simple", kffdb, db2, "union",
                   str(a)],
                  ["simple", kffdb, db2, "union", str(b)],
                  [(str(a) + s, str(b) + s)
                   for s in (".kmc_pre", ".kmc_suf")])
        elif op == "complex":
            a, b = work / "ref_cplx", work / "our_cplx"
            for defp, outdb in ((work / "c_ref.def", a),
                                (work / "c_our.def", b)):
                defp.write_text(
                    "INPUT:\n"
                    f"a={db}\n"
                    f"b={db2}\n"
                    "OUTPUT:\n"
                    f"{outdb}=(a*max b)+(a-b)\n")
            bench("complex (a*max b)+(a-b)",
                  [str(ref_tools), "-t1", "complex", str(work / "c_ref.def")],
                  ["complex", str(work / "c_our.def")],
                  [(str(a) + s, str(b) + s)
                   for s in (".kmc_pre", ".kmc_suf")])
        elif op in ("filter", "filter55", "filter127"):
            # read filtering through the RA lookup: k=27 exercises the u64
            # native path, k=55/127 the wide multi-word path (VERDICT r3
            # next #3; reference kmc_file.cpp:1193)
            kk = {"filter": 27, "filter55": 55, "filter127": 127}[op]
            import bench as bench_mod

            fq = bench_mod.prepare_input()
            q = work / "filter_query.fastq"
            if not q.exists():
                with open(fq, "rb") as f:
                    blob = f.read(48 << 20)  # record-aligned ~48 MB slice
                cut = blob.rfind(b"\n@r")
                q.write_bytes(blob[: cut + 1])
            if kk == 27:
                fdb = db
            else:
                fdb = str(work / f"fdb{kk}")
                tmpd = work / "ftmp"
                tmpd.mkdir(exist_ok=True)
                run([str(kmc), f"-k{kk}", "-ci2", "-t1", str(fq), fdb,
                     str(tmpd)])
            a, b = work / f"ref_f{kk}.fq", work / f"our_f{kk}.fq"
            bench(f"filter k={kk}",
                  [str(ref_tools), "-t1", "filter", fdb, str(q), "-ci0.5",
                   str(a)],
                  ["filter", fdb, str(q), "-ci0.5", str(b)],
                  [(a, b)])
        elif op in ("filter_trim", "filter_hm"):
            # the trim (-t) and hard-mask (-hm) modes, k=27 over the same
            # query set (fastq_filter.cpp:134-174); both transform kept
            # records, so they exercise the legacy per-record path
            import bench as bench_mod

            fq = bench_mod.prepare_input()
            q = work / "filter_query.fastq"
            if not q.exists():
                with open(fq, "rb") as f:
                    blob = f.read(48 << 20)
                cut = blob.rfind(b"\n@r")
                q.write_bytes(blob[: cut + 1])
            flag = "-t" if op == "filter_trim" else "-hm"
            a = work / f"ref_{op}.fq"
            b = work / f"our_{op}.fq"
            bench(f"filter {flag} k=27",
                  [str(ref_tools), "-t1", "filter", flag, db, "-ci2",
                   str(q), "-ci2", str(a)],
                  ["filter", flag, db, "-ci2", str(q), "-ci2", str(b)],
                  [(a, b)])
        elif op == "okff_sort":
            a, b = work / "ref_okff", work / "our_okff"
            bench("sort -okff output",
                  [str(ref_tools), "-t1", "transform", db, "sort", str(a),
                   "-okff"],
                  ["transform", db, "sort", str(b), "-okff"],
                  [(str(a) + ".kff", str(b) + ".kff")])

    n_bad = sum(1 for *_, ok in rows if not ok)
    print(f"\n{len(rows)} ops timed, {n_bad} mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
