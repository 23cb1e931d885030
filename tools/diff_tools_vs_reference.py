#!/usr/bin/env python
"""Differential validation of the kmc_tools equivalents against the real
reference kmc_tools binary.

Both sides count the same two read sets into databases with their own `kmc`,
then run the same database-algebra operations (simple set ops with counter
modes, transform reduce/histogram/set_counts/compact, compare) and the
sorted text dumps / histogram texts are byte-compared.  Set-op results are
layout-independent (sorted k-mer + count lines), so this validates the
operation semantics themselves.

Builds the reference on first use (see tools/measure_reference.py).
"""
from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.diff_vs_reference import make_input  # noqa: E402


if "--cpu" in sys.argv:
    # same XLA semantics, no dev-tunnel dependency (the tunnel can wedge)
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(cmd, **kw):
    return subprocess.run([str(c) for c in cmd], check=True,
                          capture_output=True, **kw)


def ref_count(kmc, inp, db, tmp, k=25, ci=1):
    run([kmc, f"-k{k}", f"-ci{ci}", "-fq", "-t1", "-hp", inp, db, tmp])


def tpu_count(inp, db, k=25, ci=1):
    from kmc_tpu.runner import count

    count([str(inp)], str(db), k=k, cutoff_min=ci, batch_positions=1 << 14)


def ref_dump(kmc_tools, db, workdir) -> str:
    out = Path(workdir) / (Path(db).name + ".dump")
    # simple/transform outputs are KMC1 databases (globally sorted): dump
    # directly; KMC2 inputs need a sort first
    try:
        run([kmc_tools, "transform", db, "dump", "-s", out])
    except subprocess.CalledProcessError:
        run([kmc_tools, "transform", db, "sort", str(db) + ".s"])
        run([kmc_tools, "transform", str(db) + ".s", "dump", out])
    return out.read_text()


def tpu_tools(args) -> int:
    from kmc_tpu.tools_cli import main

    return main([str(a) for a in args])


def tpu_dump(db, workdir) -> str:
    out = Path(workdir) / (Path(db).name + ".tdump")
    assert tpu_tools(["transform", db, "dump", "-s", out]) == 0
    return out.read_text()


def main():
    from tools.measure_reference import build_reference

    workdir = Path(tempfile.mkdtemp(prefix="kmc_tools_diff_"))
    kmc = build_reference(Path(tempfile.gettempdir()))
    kmc_tools = kmc.parent / "kmc_tools"
    tmp = workdir / "tmp"
    tmp.mkdir()

    # two read sets over ONE genome so the set operations have real
    # intersections and the counter modes are exercised on shared k-mers
    import numpy as np

    rng = np.random.default_rng(33)
    genome = rng.integers(0, 4, 60_000)
    r1 = workdir / "r1.fastq"
    r2 = workdir / "r2.fastq"
    for path in (r1, r2):
        with open(path, "w") as f:
            for i in range(800):
                start = rng.integers(0, len(genome) - 150)
                seq = "".join("ACGT"[c] for c in genome[start : start + 150])
                f.write(f"@r{i}\n{seq}\n+\n{'I' * 150}\n")

    ref1, ref2 = workdir / "refdb1", workdir / "refdb2"
    tpu1, tpu2 = workdir / "tpudb1", workdir / "tpudb2"
    ref_count(kmc, r1, ref1, tmp)
    ref_count(kmc, r2, ref2, tmp)
    tpu_count(r1, tpu1)
    tpu_count(r2, tpu2)

    failures = 0

    def check(tag, want, got):
        nonlocal failures
        ok = want == got
        print(f"{tag}: {'MATCH' if ok else 'MISMATCH'} "
              f"({want.count(chr(10))} lines)")
        if not ok:
            failures += 1
            for a, b in zip(want.splitlines(), got.splitlines()):
                if a != b:
                    print(f"  first diff: ref={a!r} tpu={b!r}")
                    break

    def check_db_bytes(tag, ref_prefix, tpu_prefix):
        """Byte-identity of the output DATABASE FILES themselves (stronger
        than dump-identity: pins headers, LUT sizing and counter widths to
        the reference writers', kmc1_db_writer.h / kff_db_writer.h)."""
        nonlocal failures
        import filecmp

        ref_prefix, tpu_prefix = str(ref_prefix), str(tpu_prefix)
        sufs = [""] if ref_prefix.endswith(".kff") else \
            [".kmc_pre", ".kmc_suf"]
        ok = all(filecmp.cmp(ref_prefix + s, tpu_prefix + s, shallow=False)
                 for s in sufs)
        print(f"{tag} [db bytes]: {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            failures += 1

    simple_cases = [
        ("union", None), ("intersect", None), ("kmers_subtract", None),
        ("counters_subtract", None), ("reverse_kmers_subtract", None),
        ("reverse_counters_subtract", None), ("union", "min"),
        ("intersect", "max"), ("intersect", "sum"), ("union", "diff"),
        ("intersect", "left"), ("intersect", "right"),
    ]
    for op, mode in simple_cases:
        tag = f"simple {op}" + (f" -oc{mode}" if mode else "")
        rout = workdir / f"ref_{op}_{mode}"
        tout = workdir / f"tpu_{op}_{mode}"
        margs = [f"-oc{mode}"] if mode else []
        # reference syntax: mode is an OUTPUT param (after the output name);
        # ours accepts it before — both orders express the same operation
        run([kmc_tools, "simple", ref1, ref2, op, rout, *margs])
        assert tpu_tools(["simple", tpu1, tpu2, op, *margs, tout]) == 0
        check(tag, ref_dump(kmc_tools, rout, workdir),
              tpu_dump(tout, workdir))
        check_db_bytes(tag, rout, tout)

    # per-input -ci/-cx (reference input_params) + input-derived output
    # defaulting: counters_subtract is the op whose results can fall below
    # the defaulted output ci, so it pins the defaulting semantics too
    input_cut_cases = [
        ("intersect", ["-ci3"], []),
        ("union", ["-ci2"], ["-cx4"]),
        ("counters_subtract", ["-ci2"], []),
        ("kmers_subtract", [], ["-cx3"]),
    ]
    for op, cut1, cut2 in input_cut_cases:
        tag = f"simple {' '.join(cut1)} / {' '.join(cut2)} {op}"
        rout = workdir / f"ref_ic_{op}"
        tout = workdir / f"tpu_ic_{op}"
        run([kmc_tools, "simple", ref1, *cut1, ref2, *cut2, op, rout])
        assert tpu_tools(["simple", tpu1, *cut1, tpu2, *cut2, op, tout]) == 0
        check(tag, ref_dump(kmc_tools, rout, workdir),
              tpu_dump(tout, workdir))
        check_db_bytes(tag, rout, tout)

    # -okff output (reference appends .kff, kff_db_writer.h:79) with full
    # cross-reads: each side's transform dump must read the OTHER side's
    # KFF file identically
    run([kmc_tools, "simple", ref1, ref2, "union", workdir / "ref_okff",
         "-okff"])
    assert tpu_tools(["simple", tpu1, tpu2, "union", workdir / "tpu_okff",
                      "-okff"]) == 0
    ref_kff_dump = ref_dump(kmc_tools, workdir / "ref_okff.kff", workdir)
    check("simple union -okff", ref_kff_dump,
          tpu_dump(workdir / "tpu_okff.kff", workdir))
    check_db_bytes("simple union -okff", workdir / "ref_okff.kff",
                   workdir / "tpu_okff.kff")
    check("cross-read: tpu dumps ref .kff", ref_kff_dump,
          tpu_dump(workdir / "ref_okff.kff", workdir))
    check("cross-read: ref dumps tpu .kff", ref_kff_dump,
          ref_dump(kmc_tools, workdir / "tpu_okff.kff", workdir))

    # non-default KFF encoding: the reference dumps our encoded file
    # through its encoding byte (dump_writer.h:85-94) and forces KFF
    # output for the union (parameters_parser.cpp:796-838) — both sides'
    # dumps and each side's read of the other's union must agree
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_tools import write_encoded_kff

    enc_kff = workdir / "enc.kff"
    write_encoded_kff(str(ref1), str(enc_kff))
    check("dump of non-default-encoding kff",
          ref_dump(kmc_tools, enc_kff, workdir),
          tpu_dump(enc_kff, workdir))
    run([kmc_tools, "simple", enc_kff, enc_kff, "union",
         workdir / "ref_encu"])
    assert tpu_tools(["simple", enc_kff, enc_kff, "union",
                      workdir / "tpu_encu"]) == 0
    ref_encu = ref_dump(kmc_tools, workdir / "ref_encu.kff", workdir)
    check("union of non-default-encoding kffs (KFF enforced)",
          ref_encu, tpu_dump(workdir / "tpu_encu.kff", workdir))
    check_db_bytes("union of non-default-encoding kffs",
                   workdir / "ref_encu.kff", workdir / "tpu_encu.kff")
    check("cross-read: ref dumps tpu enc-union .kff",
          ref_encu, ref_dump(kmc_tools, workdir / "tpu_encu.kff", workdir))

    # transform -okff (sort path) + global params accepted before the mode
    run([kmc_tools, "-t1", "-hp", "transform", ref1, "sort",
         workdir / "ref_tokff", "-okff"])
    assert tpu_tools(["-t1", "-hp", "transform", tpu1, "sort",
                      workdir / "tpu_tokff", "-okff"]) == 0
    check("transform sort -okff (+globals)",
          ref_dump(kmc_tools, workdir / "ref_tokff.kff", workdir),
          tpu_dump(workdir / "tpu_tokff.kff", workdir))
    check_db_bytes("transform sort -okff", workdir / "ref_tokff.kff",
                   workdir / "tpu_tokff.kff")

    # transform with input params: the filter applies to every output op
    rout, tout = workdir / "ref_tic", workdir / "tpu_tic"
    rh, th = workdir / "ref_tic.hist", workdir / "tpu_tic.hist"
    run([kmc_tools, "transform", ref1, "-ci3", "sort", rout,
         "histogram", rh])
    assert tpu_tools(["transform", tpu1, "-ci3", "sort", tout,
                      "histogram", th]) == 0
    check("transform -ci3 sort", ref_dump(kmc_tools, rout, workdir),
          tpu_dump(tout, workdir))
    check_db_bytes("transform -ci3 sort", rout, tout)
    check("transform -ci3 histogram", rh.read_text(), th.read_text())

    # transform reduce (re-threshold)
    rout, tout = workdir / "ref_red", workdir / "tpu_red"
    run([kmc_tools, "transform", ref1, "reduce", rout, "-ci3"])
    assert tpu_tools(["transform", tpu1, "reduce", tout, "-ci3"]) == 0
    check("transform reduce -ci3", ref_dump(kmc_tools, rout, workdir),
          tpu_dump(tout, workdir))
    check_db_bytes("transform reduce -ci3", rout, tout)

    # transform set_counts
    rout, tout = workdir / "ref_sc", workdir / "tpu_sc"
    run([kmc_tools, "transform", ref1, "set_counts", "7", rout])
    assert tpu_tools(["transform", tpu1, "set_counts", "7", tout]) == 0
    check("transform set_counts 7", ref_dump(kmc_tools, rout, workdir),
          tpu_dump(tout, workdir))
    check_db_bytes("transform set_counts 7", rout, tout)

    # transform compact (drop counters -> all 1s)
    rout, tout = workdir / "ref_cp", workdir / "tpu_cp"
    run([kmc_tools, "transform", ref1, "compact", rout])
    assert tpu_tools(["transform", tpu1, "compact", tout]) == 0
    check("transform compact", ref_dump(kmc_tools, rout, workdir),
          tpu_dump(tout, workdir))
    check_db_bytes("transform compact", rout, tout)

    # transform histogram (text output)
    rout, tout = workdir / "ref.hist", workdir / "tpu.hist"
    run([kmc_tools, "transform", ref1, "histogram", rout])
    assert tpu_tools(["transform", tpu1, "histogram", tout]) == 0
    check("transform histogram", rout.read_text(), tout.read_text())

    # unsorted dump = FILE (bin) order for KMC2 inputs (the reference's
    # sequential open mode, kmc2_db_reader.h:481).  Bin numbering depends
    # on the signature-map policy, so compare both binaries dumping the
    # SAME database file, in both directions
    rout, tout = workdir / "ref_seq.dump", workdir / "tpu_seq.dump"
    run([kmc_tools, "transform", tpu1, "dump", rout])
    assert tpu_tools(["transform", tpu1, "dump", tout]) == 0
    check("unsorted dump of tpu db (both binaries)",
          rout.read_text(), tout.read_text())
    run([kmc_tools, "transform", ref1, "dump", rout])
    assert tpu_tools(["transform", ref1, "dump", tout]) == 0
    check("unsorted dump of ref db (both binaries)",
          rout.read_text(), tout.read_text())

    # complex expression (parenthesized algebra, counter modes)
    defs_ref = workdir / "complex_ref.def"
    defs_tpu = workdir / "complex_tpu.def"
    for path, d1, d2, outdb in (
        (defs_ref, ref1, ref2, workdir / "ref_cplx"),
        (defs_tpu, tpu1, tpu2, workdir / "tpu_cplx"),
    ):
        path.write_text(
            "INPUT:\n"
            f"a={d1}\n"
            f"b={d2} -ci2\n"
            "OUTPUT:\n"
            f"{outdb}=(a*max b)+(a-b)\n"
            "OUTPUT_PARAMS:\n-ci2\n"
        )
    run([kmc_tools, "complex", defs_ref])
    assert tpu_tools(["complex", defs_tpu]) == 0
    check("complex (a*max b)+(a-b) -ci2",
          ref_dump(kmc_tools, workdir / "ref_cplx", workdir),
          tpu_dump(workdir / "tpu_cplx", workdir))
    check_db_bytes("complex (a*max b)+(a-b) -ci2",
                   workdir / "ref_cplx", workdir / "tpu_cplx")

    # complex with -okff in OUTPUT_PARAMS (parser.cpp:222-227)
    for path, d1, d2, outdb in (
        (defs_ref, ref1, ref2, workdir / "ref_cplx_kff"),
        (defs_tpu, tpu1, tpu2, workdir / "tpu_cplx_kff"),
    ):
        path.write_text(
            f"INPUT:\na={d1}\nb={d2}\nOUTPUT:\n{outdb}=a+b\n"
            "OUTPUT_PARAMS:\n-okff\n")
    run([kmc_tools, "complex", defs_ref])
    assert tpu_tools(["complex", defs_tpu]) == 0
    check("complex a+b -okff",
          ref_dump(kmc_tools, workdir / "ref_cplx_kff.kff", workdir),
          tpu_dump(workdir / "tpu_cplx_kff.kff", workdir))
    check_db_bytes("complex a+b -okff", workdir / "ref_cplx_kff.kff",
                   workdir / "tpu_cplx_kff.kff")
    check("cross-read: ref dumps tpu complex .kff",
          ref_dump(kmc_tools, workdir / "ref_cplx_kff.kff", workdir),
          ref_dump(kmc_tools, workdir / "tpu_cplx_kff.kff", workdir))

    # filter: reads by k-mer content, remove/trim/hard-mask modes
    q = workdir / "query.fastq"
    with open(q, "w") as f:
        qrng = np.random.default_rng(44)
        for i in range(60):
            if i % 3 == 0:  # genome read
                start = qrng.integers(0, len(genome) - 120)
                seq = "".join("ACGT"[c] for c in genome[start : start + 120])
            elif i % 3 == 1:  # foreign read
                seq = "".join("ACGT"[c] for c in qrng.integers(0, 4, 120))
            else:  # half genome, half foreign (trim/mask interesting)
                start = qrng.integers(0, len(genome) - 60)
                seq = ("".join("ACGT"[c] for c in genome[start : start + 60])
                       + "".join("ACGT"[c] for c in qrng.integers(0, 4, 60)))
            f.write(f"@q{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    filter_cases = [
        ("default", []),
        ("-ci0.5 -cx1.0", ["-ci0.5", "-cx1.0"]),
        ("-ci30", ["-ci30"]),
        ("trim", ["TRIM"]),
        ("hard-mask", ["MASK"]),
    ]
    for tag, opts in filter_cases:
        rout = workdir / f"ref_filt_{tag.replace(' ', '_').replace('/', '')}.fq"
        tout = workdir / f"tpu_filt_{tag.replace(' ', '_').replace('/', '')}.fq"
        if opts == ["TRIM"]:
            run([kmc_tools, "filter", "-t", ref1, q, rout])
            assert tpu_tools(["filter", "-t", tpu1, q, tout]) == 0
        elif opts == ["MASK"]:
            run([kmc_tools, "filter", "-hm", ref1, q, rout])
            assert tpu_tools(["filter", "-hm", tpu1, q, tout]) == 0
        else:
            run([kmc_tools, "filter", ref1, q, *opts, rout])
            assert tpu_tools(["filter", tpu1, q, *opts, tout]) == 0
        check(f"filter {tag}", rout.read_text(), tout.read_text())

    # transform sort on a KMC1 (already sorted) input: both sides warn,
    # omit the sort, produce no output and exit 0 (kmc_tools.cpp:421-432)
    ru = workdir / "ref_u_for_sort"
    tu = workdir / "tpu_u_for_sort"
    run([kmc_tools, "simple", ref1, ref2, "union", ru])
    assert tpu_tools(["simple", tpu1, tpu2, "union", tu]) == 0
    r = subprocess.run([str(kmc_tools), "transform", str(ru), "sort",
                        str(workdir / "ref_resort")], capture_output=True)
    assert tpu_tools(["transform", tu, "sort", workdir / "tpu_resort"]) == 0
    ok = (r.returncode == 0
          and not (workdir / "ref_resort.kmc_pre").exists()
          and not (workdir / "tpu_resort.kmc_pre").exists())
    check("transform sort on KMC1 omitted", "omitted",
          "omitted" if ok else "produced output")

    # filter with DB-side cutoffs (SetMinCount/SetMaxCount,
    # kmc_tools.cpp:307-308) and FASTA output conversion (-fa)
    rout = workdir / "ref_filt_dbci.fq"
    tout = workdir / "tpu_filt_dbci.fq"
    run([kmc_tools, "filter", ref1, "-ci3", q, "-ci0.4", rout])
    assert tpu_tools(["filter", tpu1, "-ci3", q, "-ci0.4", tout]) == 0
    check("filter db -ci3 / -ci0.4", rout.read_text(), tout.read_text())
    rout = workdir / "ref_filt_fa.fa"
    tout = workdir / "tpu_filt_fa.fa"
    run([kmc_tools, "filter", ref1, q, rout, "-fa"])
    assert tpu_tools(["filter", tpu1, q, tout, "-fa"]) == 0
    check("filter -fa output", rout.read_text(), tout.read_text())

    # filter with a KFF database (the reference's CKffAndKMCRandomAccess)
    rout = workdir / "ref_filt_kff.fq"
    tout = workdir / "tpu_filt_kff.fq"
    run([kmc_tools, "filter", workdir / "ref_tokff.kff", q, "-ci0.4", rout])
    assert tpu_tools(["filter", workdir / "tpu_tokff.kff", q, "-ci0.4",
                      tout]) == 0
    check("filter with KFF db", rout.read_text(), tout.read_text())

    # filter with an @list of two inputs -> one concatenated output
    q2 = workdir / "query2.fastq"
    q2.write_text("".join(q.read_text().splitlines(keepends=True)[:40]))
    lst = workdir / "filter_inputs.lst"
    lst.write_text(f"{q}\n{q2}\n")
    rout = workdir / "ref_filt_list.fq"
    tout = workdir / "tpu_filt_list.fq"
    run([kmc_tools, "filter", ref1, f"@{lst}", "-ci0.3", rout])
    assert tpu_tools(["filter", tpu1, f"@{lst}", "-ci0.3", tout]) == 0
    check("filter @list input", rout.read_text(), tout.read_text())

    # info: byte-identical stdout AND stderr for KMC and KFF databases
    # (kmc_tools.cpp:139-220; the KFF footer block goes to stderr)
    def tpu_info(db):
        import io
        from contextlib import redirect_stderr, redirect_stdout

        o, e = io.StringIO(), io.StringIO()
        with redirect_stdout(o), redirect_stderr(e):
            rc = tpu_tools(["info", db])
        assert rc == 0
        return o.getvalue(), e.getvalue()

    # both sides inspect the SAME files (info is read-only)
    for tag, db in (("kmc2 db", ref1),
                    ("kmc1 db", workdir / "ref_u_for_sort"),
                    ("kff", workdir / "ref_tokff.kff")):
        r = run([kmc_tools, "info", db])
        t_out, t_err = tpu_info(str(db))
        check(f"info {tag} stdout", r.stdout.decode(), t_out)
        check(f"info {tag} stderr", r.stderr.decode(), t_err)

    # check: prints the counter (0 when absent) and exits 0 either way
    # (check_kmer.h:241-242)
    km_line = ref_dump(kmc_tools, ref1, workdir).splitlines()[0]
    km, km_count = km_line.split("\t")
    absent = "A" * len(km)
    r_present = run([kmc_tools, "check", ref1, km])
    r_absent = subprocess.run(
        [str(kmc_tools), "check", str(ref1), absent], capture_output=True)
    import io
    from contextlib import redirect_stdout

    def tpu_check(db, q):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = tpu_tools(["check", db, q])
        return rc, buf.getvalue().strip()

    t_rc_p, t_out_p = tpu_check(tpu1, km)
    t_rc_a, t_out_a = tpu_check(tpu1, absent)
    ok = (r_present.returncode == t_rc_p == 0
          and r_present.stdout.decode().strip() == t_out_p == km_count
          and r_absent.returncode == t_rc_a == 0
          and r_absent.stdout.decode().strip() == t_out_a)
    check("check present/absent output+exit", "ok", "ok" if ok else "bad")

    # compare: equal and unequal exit semantics on each side's own DBs
    eq_ref = run([kmc_tools, "compare", ref1, ref1]).returncode
    ne_ref = subprocess.run(
        [str(kmc_tools), "compare", str(ref1), str(ref2)],
        capture_output=True).returncode
    eq_tpu = tpu_tools(["compare", tpu1, tpu1])
    ne_tpu = tpu_tools(["compare", tpu1, tpu2])
    ok = (eq_ref, bool(ne_ref)) == (eq_tpu, bool(ne_tpu))
    print(f"compare exit codes: {'MATCH' if ok else 'MISMATCH'} "
          f"(ref eq={eq_ref} ne={ne_ref}, tpu eq={eq_tpu} ne={ne_tpu})")
    failures += 0 if ok else 1

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
