#!/usr/bin/env python
"""Measure reference KMC3 on the bench workload -> BASELINE_MEASURED.json.

Builds the reference from /root/reference (with the system zlib standing in
for the unpopulated cloudflare submodule), runs it single-threaded on the
same synthetic 30x read set bench.py uses, and records k-mers/sec so
bench.py's vs_baseline is measured, not assumed.
"""
from __future__ import annotations

import json
import re
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent


def build_reference(workdir: Path) -> Path:
    build = workdir / "kmc_ref_build"
    if (build / "bin" / "kmc").exists():
        return build / "bin" / "kmc"
    shutil.copytree(REF, build)
    mk = build / "Makefile"
    text = mk.read_text()
    text = text.replace(
        "LIB_ZLIB=3rd_party/cloudflare/libz.a",
        "LIB_ZLIB=/usr/lib/x86_64-linux-gnu/libz.a",
    )
    text = "\n".join(
        ln for ln in text.splitlines() if "cd 3rd_party/cloudflare" not in ln
    )
    mk.write_text(text)
    shim = build / "3rd_party" / "cloudflare"
    shim.mkdir(parents=True, exist_ok=True)
    (shim / "zlib.h").write_text('#include "/usr/include/zlib.h"\n')
    subprocess.run(["make", "-j1", "kmc"], cwd=build, check=True,
                   capture_output=True)
    return build / "bin" / "kmc"


def main():
    import bench  # reuse the exact bench input

    fq = bench.prepare_input()
    workdir = Path(tempfile.gettempdir())
    kmc = build_reference(workdir)
    tmp = workdir / "kmc_ref_tmp"
    tmp.mkdir(exist_ok=True)
    summary = workdir / "ref_summary.json"
    subprocess.run(
        [str(kmc), f"-k{bench.K}", "-ci2", "-t1", f"-j{summary}",
         str(fq), str(workdir / "ref_out"), str(tmp)],
        check=True, capture_output=True,
    )
    doc = json.loads(summary.read_text())
    t1 = float(re.sub("[^0-9.]", "", doc["1st_stage"]))
    t2 = float(re.sub("[^0-9.]", "", doc["2nd_stage"]))
    total = t1 + t2
    n_total = doc["Stats"]["#Total no. of k-mers"]
    out = {
        "workload": f"k={bench.K} ci=2 canonical, synthetic "
                    f"{bench.COVERAGE}x {bench.READ_LEN}bp reads over "
                    f"{bench.GENOME_LEN}bp genome",
        "host": "this container (see nproc)",
        "ref_binary": "KMC 3.2.4 built from /root/reference with system zlib",
        "ref_cmd": f"kmc -k{bench.K} -ci2 -t1",
        "ref_stage1_s": t1,
        "ref_stage2_s": t2,
        "ref_total_s": total,
        "ref_kmers_per_sec": int(n_total / total),
        "ref_stats": doc["Stats"],
    }
    (REPO / "BASELINE_MEASURED.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
