#!/usr/bin/env python
"""The reference kmc/kmc_tools binaries validate databases produced by the
MULTI-CHIP pipeline (parallel/multihost.distributed_count on a virtual
8-device mesh) across the FULL feature matrix of the single-chip harness
(VERDICT r2 missing #3): formats (fastq/fasta/multifasta/BGZF-BAM/gz/
-fkmc), k widths incl. the small-k KMC1 path, cutoffs/counter sizes,
homopolymer compression, non-canonical -b, greedy signature policy,
strict-memory/tiny-capacity spill, and the -e estimate.

    python tools/diff_multichip_vs_reference.py
"""
from __future__ import annotations

import gzip
import os
import subprocess
import sys
import tempfile
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from tools.diff_vs_reference import make_bam_bgzf, make_input  # noqa: E402


def ref_dump(kmc, kmc_tools, inp, k, workdir, tag, *extra) -> str:
    db = workdir / f"refdb_{tag}"
    tmp = workdir / "tmp"
    tmp.mkdir(exist_ok=True)
    subprocess.run(
        [str(kmc), f"-k{k}", "-t1", "-hp", *extra, str(inp), str(db),
         str(tmp)],
        check=True, capture_output=True,
    )
    out = workdir / f"ref_{tag}.dump"
    if k <= 13:
        subprocess.run([str(kmc_tools), "transform", str(db), "dump",
                        str(out)], check=True, capture_output=True)
    else:
        subprocess.run([str(kmc_tools), "transform", str(db), "sort",
                        str(db) + ".sorted"], check=True,
                       capture_output=True)
        subprocess.run([str(kmc_tools), "transform", str(db) + ".sorted",
                        "dump", str(out)], check=True, capture_output=True)
    return out.read_text()


def main():
    from tools.measure_reference import build_reference

    workdir = Path(tempfile.mkdtemp(prefix="kmc_mc_diff_"))
    kmc = build_reference(Path(tempfile.gettempdir()))
    kmc_tools = kmc.parent / "kmc_tools"

    fq = workdir / "reads.fastq"
    fa = workdir / "reads.fasta"
    make_input(fq, fmt="fastq", seed=5, n_reads=1500)
    make_input(fa, fmt="fasta", seed=6, n_reads=1200)
    rng = np.random.default_rng(7)
    bam_reads = ["".join("ACGT"[c] for c in rng.integers(0, 4, 151))
                 for _ in range(500)]
    bam = make_bam_bgzf(workdir / "reads.bam", bam_reads)
    fqgz = workdir / "reads2.fastq.gz"
    with open(fq, "rb") as src, gzip.open(fqgz, "wb") as dst:
        dst.write(src.read())
    fm = workdir / "reads_multi.fasta"
    with open(fa) as src, open(fm, "w") as dst:
        for line in src:
            if line.startswith(">"):
                dst.write(line)
            else:
                s = line.strip()
                for j in range(0, len(s), 60):
                    dst.write(s[j : j + 60] + "\n")
    tmpd = workdir / "tmp"
    tmpd.mkdir(exist_ok=True)
    src_db = workdir / "src_for_fkmc"
    subprocess.run([str(kmc), "-k31", "-ci1", "-fq", "-t1", "-hp", str(fq),
                    str(src_db), str(tmpd)], check=True, capture_output=True)

    from kmc_tpu.formats import dump_db_file
    from kmc_tpu.parallel.distributed import make_mesh
    from kmc_tpu.parallel.multihost import distributed_count

    BIGCAP = 1 << 17
    # (tag, input, fmt, k, ref extra flags, distributed_count kwargs)
    cases = [
        ("fq_k21", fq, "fastq", 21, ["-ci1"], dict(cutoff_min=1)),
        ("fq_k27_ci2", fq, "fastq", 27, ["-ci2"], dict(cutoff_min=2)),
        ("fq_k31_cs64k", fq, "fastq", 31, ["-ci1", "-cs65535"],
         dict(cutoff_min=1, counter_max=65535)),
        ("fq_k55", fq, "fastq", 55, ["-ci1"], dict(cutoff_min=1)),
        ("fa_k25", fa, "fasta", 25, ["-fa", "-ci1"],
         dict(cutoff_min=1, input_file_type="fasta")),
        ("fq_k12_smallk", fq, "fastq", 12, ["-ci1"], dict(cutoff_min=1)),
        ("bam_k25", bam, "bam", 25, ["-fbam", "-ci1"],
         dict(cutoff_min=1, input_file_type="bam")),
        ("gz_k27_ci2", fqgz, "fastq", 27, ["-ci2"], dict(cutoff_min=2)),
        ("fm_k25", fm, "multifasta", 25, ["-fm", "-ci1"],
         dict(cutoff_min=1, input_file_type="multifasta")),
        ("fkmc_k25", src_db, "kmc", 25, ["-fkmc", "-ci1"],
         dict(cutoff_min=1, input_file_type="kmc")),
        ("fq_k25_hc", fq, "fastq", 25, ["-ci1", "-hc"],
         dict(cutoff_min=1, homopolymer_compressed=True)),
        ("fq_k25_b", fq, "fastq", 25, ["-ci1", "-b"],
         dict(cutoff_min=1, both_strands=False)),
        ("fq_k25_greedy", fq, "fastq", 25, ["-ci1"],
         dict(cutoff_min=1, signature_map_policy="greedy")),
        ("fq_k25_spill", fq, "fastq", 25, ["-ci1"],
         dict(cutoff_min=1, capacity_rows_per_device=1 << 11,
              strict_memory_mode=True, batch_positions=1 << 10)),
    ]
    fmt_flag = {"fastq": [], "fasta": [], "multifasta": [], "bam": [],
                "kmc": []}
    failures = 0
    for tag, inp, fmt, k, extra, kw in cases:
        kw.setdefault("batch_positions", 1 << 12)
        kw.setdefault("capacity_rows_per_device", BIGCAP)
        mdb = workdir / f"mc_{tag}"
        distributed_count([str(inp)], str(mdb), k=k, mesh=make_mesh(8),
                          **kw)
        want = ref_dump(kmc, kmc_tools, inp, k, workdir, tag, *extra)
        got = dump_db_file(str(mdb))
        if k > 13:
            # the reference binary must also read the multi-chip DB itself
            subprocess.run([str(kmc_tools), "transform", str(mdb), "sort",
                            str(mdb) + ".s"], check=True,
                           capture_output=True)
            rout = workdir / f"mc_ref_{tag}.dump"
            subprocess.run([str(kmc_tools), "transform", str(mdb) + ".s",
                            "dump", str(rout)], check=True,
                           capture_output=True)
            ref_reads_mc = rout.read_text()
        else:
            subprocess.run([str(kmc_tools), "transform", str(mdb), "dump",
                            str(workdir / f"mc_ref_{tag}.dump")],
                           check=True, capture_output=True)
            ref_reads_mc = (workdir / f"mc_ref_{tag}.dump").read_text()
        ok = want == got == ref_reads_mc
        print(f"{tag:16s}: {'MATCH' if ok else 'MISMATCH'} "
              f"({want.count(chr(10))} kmers)", flush=True)
        if not ok:
            failures += 1
            for a, b in zip(want.splitlines(), got.splitlines()):
                if a != b:
                    print(f"  first diff: ref={a!r} tpu={b!r}")
                    break

    # -e estimated histogram vs the reference binary: the sketch and the
    # ntCard recurrence are deterministic, so the histogram must be
    # byte-identical in .ehist form (VERDICT r2 missing #4)
    ref_hist = workdir / "ref.ehist"
    subprocess.run([str(kmc), "-e", "-k27", "-fq", "-t1", str(fq),
                    str(ref_hist), str(workdir)], check=True,
                   capture_output=True)
    st = distributed_count([str(fq)], str(workdir / "unused"), k=27,
                           mesh=make_mesh(8), batch_positions=1 << 12,
                           estimate_only=True)
    h = st["estimated_histogram"]
    ours = "".join(f"{i}\t{h[i]}\n" for i in range(1, len(h)))
    est_fail = 0 if ours == ref_hist.read_text() else 1
    print(f"mc_-e_estimate  : "
          f"{'MATCH (byte-identical .ehist)' if not est_fail else 'MISMATCH'}")
    failures += est_fail

    total = len(cases) + 1
    print(f"multichip matrix: {total - failures}/{total} MATCH")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
