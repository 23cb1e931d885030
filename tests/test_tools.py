"""kmc_tools-equivalent operations: transform / simple / complex / CLI."""
import numpy as np
import pytest

from kmc_tpu import oracle
from kmc_tpu.formats import dump_db_file, read_db
from kmc_tpu.runner import count
from kmc_tpu import tools_cli
from kmc_tpu.tools import db_ops
from kmc_tpu.tools.db_ops import OutputParams

from util import random_reads, write_fastq


@pytest.fixture
def two_dbs(tmp_path):
    reads1 = random_reads(60, 70, seed=1, genome_len=400)
    reads2 = random_reads(60, 70, seed=2, genome_len=400)
    db1 = str(tmp_path / "db1")
    db2 = str(tmp_path / "db2")
    count([write_fastq(tmp_path / "a.fq", reads1)], db1, k=21, cutoff_min=1,
          batch_positions=1 << 12)
    count([write_fastq(tmp_path / "b.fq", reads2)], db2, k=21, cutoff_min=1,
          batch_positions=1 << 12)
    c1 = oracle.count_kmers(reads1, 21)
    c2 = oracle.count_kmers(reads2, 21)
    c1 = {km: min(c, 255) for km, c in c1.items()}
    c2 = {km: min(c, 255) for km, c in c2.items()}
    return db1, db2, c1, c2


def _dump_dict(path_prefix):
    text = dump_db_file(path_prefix)
    out = {}
    for line in text.splitlines():
        km, c = line.split("\t")
        out[km] = int(c)
    return out


def test_union(two_dbs, tmp_path):
    db1, db2, c1, c2 = two_dbs
    out = str(tmp_path / "u")
    db_ops.run_simple_op("union", db1, db2, out)
    expect = {}
    for km in set(c1) | set(c2):
        expect[km] = min(c1.get(km, 0) + c2.get(km, 0), 255)
    assert _dump_dict(out) == expect


def test_intersect(two_dbs, tmp_path):
    db1, db2, c1, c2 = two_dbs
    out = str(tmp_path / "i")
    db_ops.run_simple_op("intersect", db1, db2, out)
    expect = {km: min(c1[km], c2[km]) for km in set(c1) & set(c2)}
    assert _dump_dict(out) == expect


def test_kmers_subtract(two_dbs, tmp_path):
    db1, db2, c1, c2 = two_dbs
    out = str(tmp_path / "s")
    db_ops.run_simple_op("kmers_subtract", db1, db2, out)
    expect = {km: min(c, 255) for km, c in c1.items() if km not in c2}
    assert _dump_dict(out) == expect


def test_counters_subtract(two_dbs, tmp_path):
    db1, db2, c1, c2 = two_dbs
    out = str(tmp_path / "cs")
    db_ops.run_simple_op("counters_subtract", db1, db2, out)
    expect = {}
    for km, c in c1.items():
        v = c - c2.get(km, 0)
        if v > 0:
            expect[km] = v
    assert _dump_dict(out) == expect


def test_intersect_counter_modes(two_dbs, tmp_path):
    db1, db2, c1, c2 = two_dbs
    for mode, fn in [("max", max), ("sum", lambda a, b: min(a + b, 255)),
                     ("left", lambda a, b: a), ("right", lambda a, b: b)]:
        out = str(tmp_path / f"m_{mode}")
        db_ops.run_simple_op("intersect", db1, db2, out, mode=mode)
        expect = {km: fn(c1[km], c2[km]) for km in set(c1) & set(c2)}
        assert _dump_dict(out) == expect, mode


def test_transform_sort_and_dump(two_dbs, tmp_path):
    db1, _, c1, _ = two_dbs
    out = str(tmp_path / "sorted")
    db_ops.transform_sort(db1, out)
    db = read_db(out)
    assert db.info.version == 0  # KMC1 sorted output
    assert _dump_dict(out) == c1
    # dump of sorted db == dump of原 db
    assert dump_db_file(out) == dump_db_file(db1)


def test_transform_histogram(two_dbs, tmp_path):
    db1, _, c1, _ = two_dbs
    out = tmp_path / "hist.txt"
    db_ops.transform_histogram(db1, str(out), 1, 300)
    hist = {}
    for line in out.read_text().splitlines():
        v, n = line.split("\t")
        hist[int(v)] = int(n)
    from collections import Counter

    expect = Counter(c1.values())
    for v in range(1, 301):
        assert hist[v] == expect.get(v, 0)


def test_transform_reduce(two_dbs, tmp_path):
    db1, _, c1, _ = two_dbs
    out = str(tmp_path / "red")
    db_ops.transform_reduce(db1, out, OutputParams(cutoff_min=2, cutoff_max=100, counter_max=10))
    expect = {km: min(c, 10) for km, c in c1.items() if 2 <= c <= 100}
    assert _dump_dict(out) == expect


def test_transform_set_counts_and_compact(two_dbs, tmp_path):
    db1, _, c1, _ = two_dbs
    out = str(tmp_path / "sc")
    db_ops.transform_set_counts(db1, out, 7)
    assert _dump_dict(out) == {km: 7 for km in c1}
    out2 = str(tmp_path / "cp")
    db_ops.transform_compact(db1, out2)
    db = read_db(out2)
    assert db.info.counter_size == 0
    assert _dump_dict(out2) == {km: 1 for km in c1}


def test_compare(two_dbs, tmp_path):
    db1, db2, _, _ = two_dbs
    assert db_ops.db_compare(db1, db1)
    assert not db_ops.db_compare(db1, db2)


def test_complex_expression(two_dbs, tmp_path):
    db1, db2, c1, c2 = two_dbs
    ops_file = tmp_path / "ops.txt"
    out = tmp_path / "cx"
    ops_file.write_text(
        f"INPUT:\na = {db1}\nb = {db2}\nOUTPUT:\n{out} = (a - b) + (a * b)\n"
        "OUTPUT_PARAMS:\n-ci1\n"
    )
    from kmc_tpu.tools.complex_ops import run_complex_file

    run_complex_file(str(ops_file))
    expect = {}
    for km, c in c1.items():
        if km not in c2:
            expect[km] = c
        else:
            expect[km] = min(c, c2[km])
    assert _dump_dict(str(out)) == expect


def test_tools_cli(two_dbs, tmp_path, capsys):
    db1, db2, c1, c2 = two_dbs
    assert tools_cli.main(["info", db1]) == 0
    captured = capsys.readouterr()
    assert "k                 :  21" in captured.out  # reference spacing
    # check a known k-mer
    km = next(iter(c1))
    assert tools_cli.main(["check", db1, km]) == 0
    assert int(capsys.readouterr().out.strip()) == c1[km]
    # dump via cli
    out_txt = str(tmp_path / "d.txt")
    assert tools_cli.main(["transform", db1, "dump", out_txt]) == 0
    assert open(out_txt).read() == dump_db_file(db1)
    # simple via cli with -oc mode
    out_db = str(tmp_path / "u2")
    assert tools_cli.main(["simple", db1, db2, "union", "-ocmax", out_db]) == 0
    expect = {km: max(c1.get(km, 0), c2.get(km, 0)) for km in set(c1) | set(c2)}
    assert _dump_dict(out_db) == expect
    # compare exit codes
    assert tools_cli.main(["compare", db1, db1]) == 0
    assert tools_cli.main(["compare", db1, db2]) == 1


def test_complex_expression_streaming_matches(two_dbs, tmp_path, monkeypatch):
    """The streaming complex evaluator (composed merge streams — the
    CInput/CBundle analogue) writes a byte-identical DB to the in-memory
    tree, including repeated input names, per-input cutoffs, counter modes
    and parentheses."""
    from kmc_tpu.tools.complex_ops import run_complex_file

    db1, db2, c1, c2 = two_dbs
    for i, (expr, params) in enumerate([
        ("(a - b) + (a * b)", "-ci1"),
        ("a +max b ~ (b *sum a)", "-ci1 -cs60000"),
        ("a - (b - a)", "-ci1"),
    ]):
        outs = []
        for tag, thr in (("mem", "99999999999"), ("stream", "0")):
            monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", thr)
            out = tmp_path / f"cxs{i}_{tag}"
            ops_file = tmp_path / f"ops{i}_{tag}.txt"
            ops_file.write_text(
                f"INPUT:\na = {db1} -ci1\nb = {db2} -cx50000\n"
                f"OUTPUT:\n{out} = {expr}\nOUTPUT_PARAMS:\n{params}\n")
            run_complex_file(str(ops_file))
            outs.append(str(out))
        for suf in (".kmc_pre", ".kmc_suf"):
            with open(outs[0] + suf, "rb") as a, open(outs[1] + suf, "rb") as b:
                assert a.read() == b.read(), (expr, suf)


def test_complex_streaming_rejects_k_mismatch(tmp_path, monkeypatch):
    """Review finding: the streaming complex evaluator must refuse inputs
    with different k like the in-memory path does — numpy 'S{kb}' keys of
    different widths NUL-pad and spuriously compare equal, so a silent
    garbage database would result."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from util import random_reads, write_fastq

    from kmc_tpu.runner import count
    from kmc_tpu.tools.complex_ops import run_complex_file

    inp = write_fastq(tmp_path / "km.fastq", random_reads(40, 80, seed=11))
    db1 = str(tmp_path / "km21")
    db2 = str(tmp_path / "km25")
    count([inp], db1, k=21, cutoff_min=1, batch_positions=1 << 12)
    count([inp], db2, k=25, cutoff_min=1, batch_positions=1 << 12)
    ops_file = tmp_path / "ops.txt"
    out = tmp_path / "cx_mismatch"
    ops_file.write_text(
        f"INPUT:\na = {db1}\nb = {db2}\nOUTPUT:\n{out} = a + b\n")
    for thr in ("99999999999", "0"):  # in-memory and streaming delegation
        monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", thr)
        with pytest.raises(ValueError, match="mismatch"):
            run_complex_file(str(ops_file))
