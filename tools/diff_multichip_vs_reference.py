#!/usr/bin/env python
"""The reference kmc_tools binary reads and dumps a database produced by
the MULTI-CHIP pipeline (parallel/multihost.distributed_count on a virtual
8-device mesh), and the dump byte-matches both the oracle and the
single-chip runner's DB dump — closing the loop that the multi-chip path
was previously validated only against the Python oracle (VERDICT r1).

    python tools/diff_multichip_vs_reference.py
"""
from __future__ import annotations

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

from tools.diff_vs_reference import make_input  # noqa: E402


def main():
    from tools.measure_reference import build_reference

    workdir = Path(tempfile.mkdtemp(prefix="kmc_mc_diff_"))
    kmc = build_reference(Path(tempfile.gettempdir()))
    kmc_tools = kmc.parent / "kmc_tools"

    fq = workdir / "reads.fastq"
    make_input(fq, fmt="fastq", seed=5, n_reads=1500)

    from kmc_tpu.formats import dump_db_file
    from kmc_tpu.parallel.distributed import make_mesh
    from kmc_tpu.parallel.multihost import distributed_count
    from kmc_tpu.runner import count

    failures = 0
    for ci, cap in ((1, 1 << 17), (2, 1 << 11)):  # big cap / tiny cap
        tag = f"ci={ci} cap=2^{cap.bit_length()-1}"
        mdb = workdir / f"mc_db_{ci}_{cap}"
        distributed_count([str(fq)], str(mdb), k=25, mesh=make_mesh(8),
                          batch_positions=1 << 10, cutoff_min=ci,
                          capacity_rows_per_device=cap)

        # reference binary opens + dumps the multi-chip DB
        subprocess.run([str(kmc_tools), "transform", str(mdb), "sort",
                        str(mdb) + ".s"], check=True, capture_output=True)
        rout = workdir / f"mc_ref_{ci}_{cap}.dump"
        subprocess.run([str(kmc_tools), "transform", str(mdb) + ".s",
                        "dump", str(rout)], check=True, capture_output=True)
        ref_text = rout.read_text()

        # single-chip runner on the same input
        sdb = workdir / f"sc_db_{ci}_{cap}"
        count([str(fq)], str(sdb), k=25, cutoff_min=ci,
              batch_positions=1 << 12)
        ok = ref_text == dump_db_file(str(mdb)) == dump_db_file(str(sdb))
        print(f"multi-chip DB read by reference binary ({tag}): "
              f"{'MATCH' if ok else 'MISMATCH'} "
              f"({ref_text.count(chr(10))} kmers)")
        failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
