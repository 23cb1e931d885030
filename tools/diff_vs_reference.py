#!/usr/bin/env python
"""Differential validation against the real reference KMC binary.

Counts the same inputs with reference `kmc` + `kmc_tools transform dump -s`
and with kmc_tpu, and byte-compares the sorted text dumps — the acceptance
criterion of the reference's own CI (run_small_fastq_tests.py:124-144).

Builds the reference on first use (see tools/measure_reference.py).
"""
from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import struct

import numpy as np


def make_input(path: Path, *, n_reads=2000, read_len=150, seed=0, fmt="fastq",
               with_n=True):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 100_000)
    with open(path, "w") as f:
        for i in range(n_reads):
            start = rng.integers(0, len(genome) - read_len)
            seq = "".join("ACGT"[c] for c in genome[start : start + read_len])
            if with_n and i % 37 == 3:
                pos = rng.integers(0, read_len)
                seq = seq[:pos] + "N" + seq[pos + 1 :]
            if fmt == "fastq":
                f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
            else:
                f.write(f">r{i}\n{seq}\n")


def bgzf_block(payload: bytes) -> bytes:
    """One spec-compliant BGZF block (gzip member with the BC extra field
    carrying the block size; SAM spec 4.1)."""
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    bsize = len(comp) + 25 + 1  # header(12) + extra(6) + comp + crc/isize(8)
    header = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 + b"\x06\x00"
              + b"BC\x02\x00" + struct.pack("<H", bsize - 1))
    return (header + comp + struct.pack("<I", zlib.crc32(payload))
            + struct.pack("<I", len(payload) & 0xFFFFFFFF))


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def make_bam_bgzf(path, reads):
    """Spec-compliant BGZF BAM with simple unmapped records."""
    code = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}
    body = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 1)
    body += struct.pack("<i", 4) + b"ref\x00" + struct.pack("<i", 1000)
    for i, r in enumerate(reads):
        name = f"r{i}".encode() + b"\x00"
        l_seq = len(r)
        seq_bytes = bytearray()
        for j in range(0, l_seq, 2):
            hi = code[r[j]] << 4
            lo = code[r[j + 1]] if j + 1 < l_seq else 0
            seq_bytes.append(hi | lo)
        qual = b"\xff" * l_seq
        rec = struct.pack("<iiBBHHHiiii", 0, 0, len(name), 30, 0, 0, 0,
                          l_seq, -1, -1, 0)
        rec += name + bytes(seq_bytes) + qual
        body += struct.pack("<i", len(rec)) + rec
    with open(path, "wb") as f:
        for lo in range(0, len(body), 60000):
            f.write(bgzf_block(body[lo : lo + 60000]))
        f.write(BGZF_EOF)
    return str(path)


def ref_dump(kmc, kmc_tools, inp, k, ci, cs, fmt, workdir) -> str:
    db = workdir / f"refdb_k{k}"
    tmp = workdir / "tmp"
    tmp.mkdir(exist_ok=True)
    fflag = {"fastq": "-fq", "fasta": "-fa", "bam": "-fbam",
             "multifasta": "-fm", "kmc": "-fkmc"}[fmt]
    subprocess.run(
        [str(kmc), f"-k{k}", f"-ci{ci}", f"-cs{cs}", fflag, "-t1", "-hp",
         str(inp), str(db), str(tmp)],
        check=True, capture_output=True,
    )
    out = workdir / f"ref_k{k}.dump"
    if k <= 13:
        # small-k output is a KMC1 database, already globally sorted; the
        # reference rejects re-sorting it
        subprocess.run(
            [str(kmc_tools), "transform", str(db), "dump", str(out)],
            check=True, capture_output=True)
    else:
        subprocess.run(
            [str(kmc_tools), "transform", str(db), "sort", str(db) + ".sorted"],
            check=True, capture_output=True)
        subprocess.run(
            [str(kmc_tools), "transform", str(db) + ".sorted", "dump", str(out)],
            check=True, capture_output=True)
    return out.read_text()


def tpu_dump(inp, k, ci, cs, fmt, workdir) -> str:
    from kmc_tpu.formats import dump_db_file
    from kmc_tpu.runner import InputFileType, count

    db = str(workdir / f"tpudb_k{k}")
    count([str(inp)], db, k=k, cutoff_min=ci, counter_max=cs,
          input_file_type=InputFileType(fmt), batch_positions=1 << 14)
    return dump_db_file(db)


def sweep_main():
    """--sweep: byte-compare dumps for a wide k matrix on the CPU backend —
    fast compiles, identical XLA semantics.  Default: every lane-width
    boundary; --sweep-full: EVERY k from 1 to 256, exactly the reference's
    own self-hosted CI matrix (prepare_small_fastq_tests.py:66-67,
    self-hosted.yml:27-36)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tools.measure_reference import build_reference

    workdir = Path(tempfile.mkdtemp(prefix="kmc_sweep_"))
    kmc = build_reference(Path(tempfile.gettempdir()))
    kmc_tools = kmc.parent / "kmc_tools"
    fq = workdir / "reads.fastq"
    make_input(fq, fmt="fastq", seed=4, n_reads=600, read_len=300)

    if "--sweep-full" in sys.argv:
        # one process per k-range batch: 256 jit-compiled k variants in one
        # process exhaust the XLA CPU executable arena (measured OOM at
        # ~k=123); the runner script shards into subprocesses
        lo, hi = 1, 256
        for a in sys.argv:
            if a.startswith("--k-range="):
                lo, hi = (int(x) for x in a.split("=")[1].split(":"))
        ks = list(range(lo, hi + 1))
    else:
        ks = sorted(set(
            list(range(1, 18)) + [24, 25, 31, 32, 33, 47, 48, 49, 63, 64,
                                  65, 95, 96, 97, 127, 128, 129, 160, 191,
                                  192, 193, 224, 255, 256]
        ))
    failures = 0
    for k in ks:
        want = ref_dump(kmc, kmc_tools, fq, k, 1, 255, "fastq", workdir)
        got = tpu_dump(fq, k, 1, 255, "fastq", workdir)
        ok = want == got
        if not ok:
            failures += 1
            print(f"k={k:3d}: MISMATCH")
            for a, b in zip(want.splitlines(), got.splitlines()):
                if a != b:
                    print(f"  first diff: ref={a!r} tpu={b!r}")
                    break
        else:
            print(f"k={k:3d}: MATCH ({want.count(chr(10))} kmers)", flush=True)
    print(f"sweep: {len(ks) - failures}/{len(ks)} MATCH")
    sys.exit(1 if failures else 0)


def main():
    if "--cpu" in sys.argv:
        # same XLA semantics, no dev-tunnel dependency
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tools.measure_reference import build_reference

    workdir = Path(tempfile.mkdtemp(prefix="kmc_diff_"))
    kmc = build_reference(Path(tempfile.gettempdir()))
    kmc_tools = kmc.parent / "kmc_tools"

    fq = workdir / "reads.fastq"
    fa = workdir / "reads.fasta"
    make_input(fq, fmt="fastq", seed=1)
    make_input(fa, fmt="fasta", seed=2)
    rng = np.random.default_rng(3)
    bam_reads = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, 151)) for _ in range(500)
    ]
    bam = make_bam_bgzf(workdir / "reads.bam", bam_reads)

    # gzip input (detected by extension on both sides)
    import gzip

    fqgz = workdir / "reads2.fastq.gz"
    with open(fq, "rb") as src, gzip.open(fqgz, "wb") as dst:
        dst.write(src.read())
    # multiline FASTA (-fm): 60-column wrapped sequences
    fm = workdir / "reads_multi.fasta"
    with open(fa) as src, open(fm, "w") as dst:
        for line in src:
            if line.startswith(">"):
                dst.write(line)
            else:
                s = line.strip()
                for j in range(0, len(s), 60):
                    dst.write(s[j : j + 60] + "\n")
    # -fkmc input: an existing KMC database's stored k-mers become the
    # reads (binary_reader.h:240-300: one FASTA record per stored k-mer,
    # counters ignored); source DB built by the reference binary
    src_db = workdir / "src_for_fkmc"
    tmpd = workdir / "tmp"
    tmpd.mkdir(exist_ok=True)
    subprocess.run([str(kmc), "-k31", "-ci1", "-fq", "-t1", "-hp", str(fq),
                    str(src_db), str(tmpd)], check=True, capture_output=True)

    cases = [
        (fq, "fastq", 21, 1, 255),
        (fq, "fastq", 27, 2, 255),
        (fq, "fastq", 31, 1, 65535),
        (fq, "fastq", 55, 1, 255),
        (fa, "fasta", 25, 1, 255),
        (fq, "fastq", 12, 1, 255),   # small-k KMC1 path
        (bam, "bam", 25, 1, 255),    # BGZF BAM
        (fqgz, "fastq", 27, 2, 255),  # gzip by extension
        (fm, "multifasta", 25, 1, 255),  # -fm multiline FASTA
        (src_db, "kmc", 25, 1, 255),  # -fkmc DB-as-input
    ]
    # -e estimated histogram: the ntHash sketch (constants, sampling
    # prefixes, r/s params) and the ntCard recurrence (incl. the int64
    # truncation of F0Mean and the abs/int rounding) are deterministic, so
    # the .ehist FILE must be byte-identical to the reference binary's
    # (ntHashWrapper.h:97-456; VERDICT r2 missing #4)
    from kmc_tpu.cli import main as kmc_cli_main

    est_fail = 0
    for ek in (27, 31, 55):
        ref_hist = workdir / f"ref_k{ek}.ehist"
        subprocess.run([str(kmc), "-e", f"-k{ek}", "-fq", "-t1", str(fq),
                        str(ref_hist), str(workdir)], check=True,
                       capture_output=True)
        tpu_hist = workdir / f"tpu_k{ek}.ehist"
        assert kmc_cli_main(["-e", f"-k{ek}", "-hp", str(fq), str(tpu_hist),
                             str(workdir)]) == 0
        ok = ref_hist.read_bytes() == tpu_hist.read_bytes()
        if not ok:
            est_fail += 1
            print(f"  k={ek}: ref={ref_hist.read_text()[:80]!r} "
                  f"tpu={tpu_hist.read_text()[:80]!r}")
        print(f"-e estimated histogram k={ek} (byte-identical .ehist): "
              f"{'MATCH' if ok else 'MISMATCH'}")

    # the reference binary must be able to open and dump a DB produced
    # under signature_map_policy="greedy" (the parity property the greedy
    # map guarantees even though the bin numbering composition differs —
    # signatures.py docstring)
    from kmc_tpu.formats import dump_db_file
    from kmc_tpu.runner import count as tpu_count

    gdb = workdir / "tpudb_greedy"
    tpu_count([str(fq)], str(gdb), k=27, cutoff_min=2,
              signature_map_policy="greedy", batch_positions=1 << 14)
    subprocess.run([str(kmc_tools), "transform", str(gdb), "sort",
                    str(gdb) + ".s"], check=True, capture_output=True)
    gout = workdir / "greedy_ref.dump"
    subprocess.run([str(kmc_tools), "transform", str(gdb) + ".s", "dump",
                    str(gout)], check=True, capture_output=True)
    gok = gout.read_text() == dump_db_file(str(gdb))
    print(f"greedy-policy DB read by reference kmc_tools: "
          f"{'MATCH' if gok else 'MISMATCH'}")

    # the CLI summary's Stats block must byte-match the reference's
    # (kmc_CLI/kmc.cpp:409-420, setw(12) columns)
    import io
    from contextlib import redirect_stdout

    rs = subprocess.run([str(kmc), "-k21", "-ci2", "-fq", "-t1", "-hp",
                         str(fq), str(workdir / "sref"), str(workdir)],
                        check=True, capture_output=True)
    ref_stats = rs.stdout.decode().split("Stats:", 1)[1]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert kmc_cli_main(["-k21", "-ci2", "-hp", str(fq),
                             str(workdir / "stpu"), str(workdir)]) == 0
    tpu_stats = buf.getvalue().split("Stats:", 1)[1]
    sok = ref_stats == tpu_stats
    print(f"CLI summary Stats block: {'MATCH' if sok else 'MISMATCH'}")

    # homopolymer-compressed counting (-hc, splitter.cpp:424-435)
    subprocess.run([str(kmc), "-k25", "-ci1", "-hc", "-fq", "-t1", "-hp",
                    str(fq), str(workdir / "hcref"), str(workdir)],
                   check=True, capture_output=True)
    subprocess.run([str(kmc_tools), "transform", str(workdir / "hcref"),
                    "sort", str(workdir / "hcref.s")],
                   check=True, capture_output=True)
    subprocess.run([str(kmc_tools), "transform", str(workdir / "hcref.s"),
                    "dump", str(workdir / "hcref.txt")],
                   check=True, capture_output=True)
    with redirect_stdout(io.StringIO()):
        assert kmc_cli_main(["-k25", "-ci1", "-hc", "-hp", str(fq),
                             str(workdir / "hctpu"), str(workdir)]) == 0
    hok = (workdir / "hcref.txt").read_text() == dump_db_file(
        str(workdir / "hctpu"))
    print(f"homopolymer-compressed (-hc): {'MATCH' if hok else 'MISMATCH'}")

    failures = 0
    failures += est_fail
    failures += 0 if gok else 1
    failures += 0 if sok else 1
    failures += 0 if hok else 1
    for inp, fmt, k, ci, cs in cases:
        want = ref_dump(kmc, kmc_tools, inp, k, ci, cs, fmt, workdir)
        got = tpu_dump(inp, k, ci, cs, fmt, workdir)
        ok = want == got
        print(f"k={k:3d} ci={ci} cs={cs} {fmt}: "
              f"{'MATCH' if ok else 'MISMATCH'} ({want.count(chr(10))} kmers)")
        if not ok:
            failures += 1
            for a, b in zip(want.splitlines(), got.splitlines()):
                if a != b:
                    print(f"  first diff: ref={a!r} tpu={b!r}")
                    break

    # parameter-dimension cases the reference's own CI matrix varies
    # (run_small_fastq_tests.py:21-35): non-canonical -b, signature
    # lengths, bin counts, -cs1 counter-size-0 records, small -cx, @list
    fq2 = workdir / "reads_part2.fastq"
    make_input(fq2, fmt="fastq", seed=9, n_reads=800)
    lst = workdir / "inputs.lst"
    lst.write_text(f"{fq}\n{fq2}\n")
    param_cases = [
        ("-b non-canonical", ["-k25", "-ci1", "-b"], [fq],
         dict(k=25, cutoff_min=1, canonical_kmers=False)),
        ("-p5 signature", ["-k25", "-ci1", "-p5"], [fq],
         dict(k=25, cutoff_min=1, signature_len=5)),
        ("-p7 signature", ["-k25", "-ci1", "-p7"], [fq],
         dict(k=25, cutoff_min=1, signature_len=7)),
        ("-p11 signature", ["-k25", "-ci1", "-p11"], [fq],
         dict(k=25, cutoff_min=1, signature_len=11)),
        ("-n64 bins", ["-k25", "-ci1", "-n64"], [fq],
         dict(k=25, cutoff_min=1, n_bins=64)),
        ("-n2000 bins", ["-k25", "-ci1", "-n2000"], [fq],
         dict(k=25, cutoff_min=1, n_bins=2000)),
        ("-cs1 counter-size-0", ["-k25", "-ci1", "-cs1"], [fq],
         dict(k=25, cutoff_min=1, counter_max=1)),
        ("-cx3 small cutoff-max", ["-k25", "-ci1", "-cx3"], [fq],
         dict(k=25, cutoff_min=1, cutoff_max=3)),
        ("@list multi-file", ["-k25", "-ci1"], [fq, fq2],
         dict(k=25, cutoff_min=1)),
    ]
    from kmc_tpu.runner import count as _count

    for tag, flags, inputs, kw in param_cases:
        rdb = workdir / f"refdb_{tag.split()[0].strip('-@')}"
        tmp = workdir / "tmp"
        tmp.mkdir(exist_ok=True)
        in_arg = str(inputs[0]) if len(inputs) == 1 else "@" + str(lst)
        subprocess.run([str(kmc), *flags, "-fq", "-t1", "-hp", in_arg,
                        str(rdb), str(tmp)], check=True,
                       capture_output=True)
        rout = workdir / f"ref_{tag.split()[0].strip('-@')}.dump"
        if "-cs1" in flags:
            # the reference's kmc_tools refuses counter-size-0 DBs
            # entirely ("does not support k-mer sets without counters");
            # its legacy kmc_dump binary reads them — dump and sort the
            # lines (k-mers unique: line order == sorted-dump order)
            kmc_dump = kmc.parent / "kmc_dump"
            subprocess.run([str(kmc_dump), str(rdb), str(rout)],
                           check=True, capture_output=True)
            want = "".join(sorted(rout.read_text().splitlines(True)))
        else:
            subprocess.run([str(kmc_tools), "transform", str(rdb), "sort",
                            str(rdb) + ".s"], check=True,
                           capture_output=True)
            subprocess.run([str(kmc_tools), "transform", str(rdb) + ".s",
                            "dump", str(rout)], check=True,
                           capture_output=True)
            want = rout.read_text()
        tdb = str(workdir / f"tpudb_{tag.split()[0].strip('-@')}")
        _count([str(p) for p in inputs], tdb, batch_positions=1 << 14, **kw)
        got = dump_db_file(tdb)
        ok = want == got
        print(f"{tag}: {'MATCH' if ok else 'MISMATCH'} "
              f"({want.count(chr(10))} kmers)")
        if not ok:
            failures += 1
            for a, b in zip(want.splitlines(), got.splitlines()):
                if a != b:
                    print(f"  first diff: ref={a!r} tpu={b!r}")
                    break
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    if "--sweep" in sys.argv or "--sweep-full" in sys.argv:
        sweep_main()
    main()
