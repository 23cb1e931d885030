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


def test_greedy_checkpoint_preserves_bin_count(tmp_path):
    """Round-tripping a greedy-policy store must not inflate n_used_bins
    (the saved map keeps -1 for disallowed slots; regression: the rewritten
    dead-bin id fed back through __init__ grew the count by one per cycle)."""
    import numpy as np

    from kmc_tpu.io.native import pack_codes
    from kmc_tpu.ops.extract import batch_len
    from kmc_tpu.ops.store import DeviceKmerStore
    from kmc_tpu.signatures import build_signature_map, map_size

    sig_map = build_signature_map(np.ones(map_size(7), np.uint64), 7, 64)
    st = DeviceKmerStore(1 << 12, k=21, sig_len=7, both_strands=True,
                         n_bins=64, map_mode="greedy", sig_map=sig_map)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, batch_len(1 << 10, 21)).astype(np.uint8)
    st.ingest_packed(*pack_codes(codes), s=1 << 10)
    n0 = st.n_used_bins
    path = str(tmp_path / "ck")
    st.save_checkpoint(path)
    st2 = DeviceKmerStore.load_checkpoint(path, capacity_rows=1 << 12)
    assert st2.n_used_bins == n0
    assert st2.fuse == st.fuse and st2.n_cols == st.n_cols
    st2.save_checkpoint(path + "2")
    st3 = DeviceKmerStore.load_checkpoint(path + "2", capacity_rows=1 << 12)
    assert st3.n_used_bins == n0
