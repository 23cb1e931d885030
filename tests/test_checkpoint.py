"""Checkpoint/resume: stage-1 state persists, stage 2 restarts from it."""
import numpy as np

from kmc_tpu import oracle
from kmc_tpu.formats import dump_db_file
from kmc_tpu.runner import Runner, Stage1Params, Stage2Params


def test_stage1_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(3)
    reads = tmp_path / "r.fastq"
    with open(reads, "w") as f:
        for i in range(200):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 150))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 150}\n")

    p1 = Stage1Params(input_files=[str(reads)], kmer_len=25,
                      batch_positions=1 << 12)
    r = Runner()
    res1 = r.run_stage1(p1)
    ckpt = str(tmp_path / "ck")
    r.save_stage1_checkpoint(ckpt)

    # resume in a fresh Runner and complete stage 2
    r2 = Runner()
    p1b = Stage1Params(input_files=[str(reads)], batch_positions=1 << 12)
    r2.resume_stage1_checkpoint(ckpt, p1b)
    out = str(tmp_path / "db")
    res2 = r2.run_stage2(Stage2Params(output_file_name=out, cutoff_min=1))

    records, stats = oracle.oracle_count_file(str(reads), 25, "fastq", cutoff_min=1)
    assert dump_db_file(out) == oracle.dump_text(records)
    assert res2.n_total_kmers == stats["n_total"]
    assert res2.n_unique_kmers == stats["n_unique"]
