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
    # the kmc_tools writers always store >= 1 counter byte, even for
    # compact's all-ones counters (kmc_tools/kmc1_db_writer.h:154)
    assert db.info.counter_size == 1
    assert _dump_dict(out2) == {km: 1 for km in c1}


def test_tools_counter_size_rule():
    """kmc_tools output counter widths: MIN(BYTE_LOG(cs), BYTE_LOG(cx)),
    always >= 1 (unlike the counting engine's counter_max==1 -> 0 bytes),
    BYTE_LOG capped at 4; set_counts sizes KMC1 counters from the fixed
    value but KFF outputs ignore it (kmc1_db_writer.h:154-156,
    kff_db_writer.h:74)."""
    f = db_ops.tools_counter_size
    assert f(10**9, 1) == 1          # compact: 1 byte, not 0
    assert f(10**9, 255) == 1
    assert f(10**9, 65535) == 2
    assert f(255, 10**9) == 1        # min of the two
    assert f(2**40, 2**40) == 4      # BYTE_LOG caps at 4
    assert f(0xFFFFFFFF, 0xFFFFFFFF, counter_value=7) == 1
    assert f(0xFFFFFFFF, 0xFFFFFFFF, counter_value=300) == 2
    assert f(0xFFFFFFFF, 0xFFFFFFFF, counter_value=300, kff=True) == 4


def test_compact_header_fields(two_dbs, tmp_path):
    """compact defaults output ci/cx from the input header and filters on
    the ORIGINAL counters (parameters_parser.cpp:437-441)."""
    db1, _, c1, _ = two_dbs
    out = str(tmp_path / "cp_ci")
    db_ops.transform_compact(db1, out, {"ci": 3})
    info = read_db(out).info
    assert info.counter_size == 1
    assert info.cutoff_min == 3
    assert _dump_dict(out) == {km: 1 for km, c in c1.items() if c >= 3}


def test_set_counts_header_fields(two_dbs, tmp_path):
    """set_counts output header: ci=1, cx=cs=uint32 max, counter bytes
    sized from the value (parameters_parser.cpp:443-450)."""
    db1, _, c1, _ = two_dbs
    out = str(tmp_path / "sc_hdr")
    db_ops.transform_set_counts(db1, out, 300)
    info = read_db(out).info
    assert info.counter_size == 2  # BYTE_LOG(300)
    assert info.cutoff_min == 1
    assert info.cutoff_max == 0xFFFFFFFF
    assert _dump_dict(out) == {km: 300 for km in c1}


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


_ENC_TRANS = str.maketrans("ACGT", "TGCA")


def _sym_key(s):
    """Lexicographic key of a k-mer string under encoding 0b11100100
    (A->3 C->2 G->1 T->0): map each char to one whose ASCII order equals
    its symbol value."""
    return s.translate(_ENC_TRANS)


def _revcomp(s):
    return s.translate(_ENC_TRANS)[::-1]


def write_encoded_kff(db1, kff, enc=0b11100100):
    """Build a KFF file in `enc`'s symbol space holding db1's k-mers,
    records canonicalized IN SYMBOL SPACE (queries canonicalize there too,
    matching the reference's translate-then-standard-lookup flow,
    kff_random_access.h:118-151).  Returns {stored repr: count}."""
    from kmc_tpu.formats.kff import KffWriter
    from kmc_tpu.formats.dump import dump_db_file

    perm = {"A": (enc >> 6) & 3, "C": (enc >> 4) & 3,
            "G": (enc >> 2) & 3, "T": enc & 3}
    recs = {}
    for ln in dump_db_file(db1).splitlines():
        km, c = ln.split("\t")
        recs[min(km, _revcomp(km), key=_sym_key)] = int(c)
    k = len(next(iter(recs)))
    kb = (k + 3) // 4
    reprs = sorted(recs, key=_sym_key)
    rows = np.zeros((len(reprs), kb), np.uint8)
    for i, s in enumerate(reprs):
        syms = [perm[ch] for ch in s]
        syms = [0] * (kb * 4 - k) + syms
        for j, v in enumerate(syms):
            rows[i, j // 4] |= v << (2 * (3 - (j % 4)))
    counts = np.array([recs[s] for s in reprs], np.uint32)
    w = KffWriter(kff, canonical=True, k=k, counter_size=1,
                  min_count=1, max_count=255, encoding=enc)
    w.store_section(rows, counts)
    w.close()
    return recs


def test_kff_nondefault_encoding(two_dbs, tmp_path):
    """KFF files may use any A/C/G/T <-> 2-bit permutation; the tools must
    dump them through the encoding byte (dump_writer.h:85-94), answer
    queries by re-encoding them (kff_random_access.h:118-140), reject
    mixed-encoding input sets (parameters_parser.cpp:778-784) and force
    KFF output for non-default encodings (parameters_parser.cpp:796-838)."""
    db1, _, c1, _ = two_dbs
    kff = str(tmp_path / "enc.kff")
    recs = write_encoded_kff(db1, kff)
    # dump decodes through the encoding byte, in raw-symbol order
    d = str(tmp_path / "enc.txt")
    assert tools_cli.main(["transform", kff, "dump", d]) == 0
    lines = open(d).read().splitlines()
    got = {ln.split("\t")[0]: int(ln.split("\t")[1]) for ln in lines}
    assert got == recs
    assert [ln.split("\t")[0] for ln in lines] == sorted(recs, key=_sym_key)
    # random access re-encodes the query: the ORIGINAL k-mer string hits
    km = next(iter(c1))
    assert tools_cli.main(["check", kff, km]) == 0
    # mixed encodings are rejected
    with pytest.raises(ValueError, match="different k-mers encodings"):
        db_ops.run_simple_op("union", kff, db1, str(tmp_path / "mix"))
    # KMC output is impossible: KFF format is enforced (with a warning)
    out = str(tmp_path / "u_enc")
    db_ops.run_simple_op("union", kff, kff, out)
    assert not (tmp_path / "u_enc.kmc_pre").exists()
    d2 = str(tmp_path / "u_enc.txt")
    assert tools_cli.main(["transform", out + ".kff", "dump", d2]) == 0
    got2 = {ln.split("\t")[0]: int(ln.split("\t")[1])
            for ln in open(d2).read().splitlines()}
    assert got2 == {km: min(2 * c, 255) for km, c in recs.items()}


def test_complex_okff_output(two_dbs, tmp_path):
    """OUTPUT_PARAMS may carry -o<kmc|kff> (parser.cpp:222-227); kff
    appends .kff like the reference's KFF writer (kff_db_writer.h:79)."""
    db1, db2, c1, c2 = two_dbs
    ops_file = tmp_path / "ops.txt"
    out = tmp_path / "cx_kff"
    ops_file.write_text(
        f"INPUT:\na = {db1}\nb = {db2}\nOUTPUT:\n{out} = a + b\n"
        "OUTPUT_PARAMS:\n-ci1 -okff\n")
    from kmc_tpu.tools.complex_ops import run_complex_file

    run_complex_file(str(ops_file))
    assert (tmp_path / "cx_kff.kff").exists()
    expect = {km: c1.get(km, 0) + c2.get(km, 0)
              for km in set(c1) | set(c2)}
    d = str(tmp_path / "cx_kff.txt")
    assert tools_cli.main(["transform", str(out) + ".kff", "dump", d]) == 0
    got = {ln.split("\t")[0]: int(ln.split("\t")[1])
           for ln in open(d).read().splitlines()}
    assert got == expect
    # unknown output type is rejected
    ops_file.write_text(
        f"INPUT:\na = {db1}\nOUTPUT:\n{tmp_path / 'z'} = a\n"
        "OUTPUT_PARAMS:\n-obad\n")
    with pytest.raises(ValueError, match="unknown output type"):
        run_complex_file(str(ops_file))


def test_tools_cli(two_dbs, tmp_path, capsys):
    db1, db2, c1, c2 = two_dbs
    assert tools_cli.main(["info", db1]) == 0
    captured = capsys.readouterr()
    assert "k                 :  21" in captured.out  # reference spacing
    # check a known k-mer
    km = next(iter(c1))
    assert tools_cli.main(["check", db1, km]) == 0
    assert int(capsys.readouterr().out.strip()) == c1[km]
    # dump via cli: without -s a KMC2 input dumps in FILE (bin) order —
    # the reference's sequential open mode ("not sorted!",
    # kmc2_db_reader.h:481); with -s it is globally sorted
    out_txt = str(tmp_path / "d.txt")
    assert tools_cli.main(["transform", db1, "dump", out_txt]) == 0
    assert open(out_txt).read() == dump_db_file(db1, sorted_output=False)
    assert tools_cli.main(["transform", db1, "dump", "-s", out_txt]) == 0
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


# ---------------- per-input -ci/-cx (reference input_params) ----------------


def test_simple_input_cuts_cli(two_dbs, tmp_path, monkeypatch):
    """Per-input -ci/-cx filter each database at read time
    (kmc1_db_reader.h:574-618) before the set operation; the in-memory and
    streaming paths must produce byte-identical DBs."""
    db1, db2, c1, c2 = two_dbs
    f1 = {km: c for km, c in c1.items() if c >= 2}
    f2 = {km: c for km, c in c2.items() if c <= 3}
    cases = [
        ("intersect", {km: min(f1[km], f2[km]) for km in set(f1) & set(f2)}),
        ("union", {km: min(f1.get(km, 0) + f2.get(km, 0), 255)
                   for km in set(f1) | set(f2)}),
        ("kmers_subtract", {km: f1[km] for km in set(f1) - set(f2)}),
    ]
    for op, expect in cases:
        out_m = str(tmp_path / f"m_{op}")
        out_s = str(tmp_path / f"s_{op}")
        assert tools_cli.main(
            ["simple", db1, "-ci2", db2, "-cx3", op, out_m]) == 0
        monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", "0")
        assert tools_cli.main(
            ["simple", db1, "-ci2", db2, "-cx3", op, out_s]) == 0
        monkeypatch.delenv("KMC_TPU_STREAM_THRESHOLD")
        assert _dump_dict(out_m) == expect, op
        for suf in (".kmc_pre", ".kmc_suf"):
            with open(out_m + suf, "rb") as a, open(out_s + suf, "rb") as b:
                assert a.read() == b.read(), (op, suf)


def test_output_defaults_from_inputs(two_dbs, tmp_path):
    """Unset output -ci defaults to the min effective input ci
    (parameters_parser.cpp:851-865): counters_subtract results below that
    bound are dropped."""
    db1, db2, c1, c2 = two_dbs
    out = str(tmp_path / "cs")
    # input1 read with ci=2 -> output ci defaults to min(2, header ci=1)=1
    assert tools_cli.main(
        ["simple", db1, "-ci2", db2, "counters_subtract", out]) == 0
    f1 = {km: c for km, c in c1.items() if c >= 2}
    expect = {}
    for km, c in f1.items():
        v = c - c2.get(km, 0) if km in c2 else c
        if v >= 1:
            expect[km] = v
    assert _dump_dict(out) == expect
    # explicit output -ci3 overrides the default
    out2 = str(tmp_path / "cs3")
    assert tools_cli.main(
        ["simple", db1, "-ci2", db2, "counters_subtract", out2, "-ci3"]) == 0
    assert _dump_dict(out2) == {km: v for km, v in expect.items() if v >= 3}


def test_transform_input_cut(two_dbs, tmp_path, monkeypatch):
    """transform <db> -ci<v>: the input filter applies to every operation
    of the invocation (dump, histogram, sort, compact, set_counts)."""
    db1, _, c1, _ = two_dbs
    f1 = {km: c for km, c in c1.items() if c >= 2}
    d = str(tmp_path / "d.txt")
    h = str(tmp_path / "h.txt")
    s = str(tmp_path / "srt")
    assert tools_cli.main(
        ["transform", db1, "-ci2", "dump", "-s", d,
         "histogram", h, "sort", s]) == 0
    got = {ln.split("\t")[0]: int(ln.split("\t")[1])
           for ln in open(d).read().splitlines()}
    assert got == f1
    assert _dump_dict(s) == f1
    hist = {int(ln.split("\t")[0]): int(ln.split("\t")[1])
            for ln in open(h).read().splitlines()}
    from collections import Counter
    want_hist = Counter(f1.values())
    assert all(hist.get(v, 0) == want_hist.get(v, 0)
               for v in range(1, max(want_hist) + 1))
    # streaming paths byte/text-identical
    monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", "0")
    d2, h2, s2 = d + "2", h + "2", s + "2"
    assert tools_cli.main(
        ["transform", db1, "-ci2", "dump", "-s", d2,
         "histogram", h2, "sort", s2]) == 0
    assert open(d).read() == open(d2).read()
    assert open(h).read() == open(h2).read()
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(s + suf, "rb") as a, open(s2 + suf, "rb") as b:
            assert a.read() == b.read()


def test_simple_multi_output_single_pass(two_dbs, tmp_path):
    """One CLI invocation with several outputs (computed off ONE aligned
    merge, run_simple_ops) must byte-match separate per-op invocations."""
    db1, db2, _, _ = two_dbs
    multi = [str(tmp_path / f"mo_{j}") for j in range(3)]
    single = [str(tmp_path / f"so_{j}") for j in range(3)]
    assert tools_cli.main(
        ["simple", db1, "-ci2", db2,
         "intersect", "-ocmax", multi[0],
         "union", multi[1], "-ci2",
         "reverse_counters_subtract", multi[2]]) == 0
    for args, out in (
        (["intersect", "-ocmax", single[0]], single[0]),
        (["union", single[1], "-ci2"], single[1]),
        (["reverse_counters_subtract", single[2]], single[2]),
    ):
        assert tools_cli.main(["simple", db1, "-ci2", db2, *args]) == 0
    for m, s in zip(multi, single):
        for suf in (".kmc_pre", ".kmc_suf"):
            with open(m + suf, "rb") as a, open(s + suf, "rb") as b:
                assert a.read() == b.read(), (m, suf)


def test_global_params_and_okff(two_dbs, tmp_path):
    """Global -t/-v/-hp before the mode (parameters_parser.cpp:58-92) and
    -o<kmc|kff> output-type params (the reference appends .kff itself,
    kff_db_writer.h:79)."""
    db1, db2, _, _ = two_dbs
    u_kmc = str(tmp_path / "u_kmc")
    u_kff = str(tmp_path / "u_kff")
    assert tools_cli.main(["-t4", "-v", "-hp", "simple", db1, db2,
                           "union", u_kmc, "-okmc",
                           "union", u_kff, "-okff"]) == 0
    assert tools_cli.GLOBAL_PARAMS == {
        "threads": 4, "verbose": True, "hide_progress": True}
    # the KFF output holds the same records as the KMC output
    d_kmc = str(tmp_path / "d_kmc.txt")
    d_kff = str(tmp_path / "d_kff.txt")
    assert tools_cli.main(["transform", u_kmc, "dump", "-s", d_kmc]) == 0
    assert tools_cli.main(["transform", u_kff + ".kff", "dump", "-s",
                           d_kff]) == 0
    assert open(d_kmc).read() == open(d_kff).read()
    # transform set_counts -okff round-trips through the KFF reader
    sc = str(tmp_path / "sc")
    assert tools_cli.main(["transform", db1, "set_counts", "9", sc,
                           "-okff"]) == 0
    d_sc = str(tmp_path / "d_sc.txt")
    assert tools_cli.main(["transform", sc + ".kff", "dump", "-s",
                           d_sc]) == 0
    lines = open(d_sc).read().splitlines()
    assert lines and all(l.split("\t")[1] == "9" for l in lines)
    # -o is rejected outside sort/reduce/compact/set_counts and for
    # unknown types; unknown global options are rejected
    assert tools_cli.main(["transform", db1, "histogram",
                           str(tmp_path / "h"), "-okff"]) == 1
    assert tools_cli.main(["transform", db1, "sort",
                           str(tmp_path / "x"), "-obad"]) == 1
    assert tools_cli.main(["-zz", "simple", db1, db2, "union",
                           str(tmp_path / "y")]) == 1
    assert tools_cli.main(["-t"]) == 1  # -t requires a value


def test_transform_multi_output_single_pass(two_dbs, tmp_path):
    """A multi-op transform invocation (one load, kmc_tools.cpp:449-470)
    must be byte-identical to separate per-op invocations."""
    db1, _, _, _ = two_dbs
    m = {n: str(tmp_path / ("m_" + n))
         for n in ("sort", "red", "cmp", "sc", "hist", "dump")}
    s = {n: str(tmp_path / ("s_" + n))
         for n in ("sort", "red", "cmp", "sc", "hist", "dump")}
    assert tools_cli.main([
        "transform", db1, "-ci2",
        "sort", m["sort"], "-cs100",
        "reduce", m["red"], "-ci3",
        "compact", m["cmp"],
        "set_counts", "5", m["sc"],
        "histogram", m["hist"],
        "dump", "-s", m["dump"]]) == 0
    for op_args in (["sort", s["sort"], "-cs100"],
                    ["reduce", s["red"], "-ci3"],
                    ["compact", s["cmp"]],
                    ["set_counts", "5", s["sc"]],
                    ["histogram", s["hist"]],
                    ["dump", "-s", s["dump"]]):
        assert tools_cli.main(["transform", db1, "-ci2", *op_args]) == 0
    for n in ("sort", "red", "cmp", "sc"):
        for suf in (".kmc_pre", ".kmc_suf"):
            with open(m[n] + suf, "rb") as a, open(s[n] + suf, "rb") as b:
                assert a.read() == b.read(), (n, suf)
    for n in ("hist", "dump"):
        assert open(m[n]).read() == open(s[n]).read(), n


def test_filter_mode_rules(two_dbs, tmp_path, capsys):
    """-t/-hm overwrite each other (last wins, parameters_parser.cpp:
    208-226) and are incompatible with fractional -ci/-cx (:656-660)."""
    db1, _, c1, _ = two_dbs
    km = next(iter(c1))
    fq = tmp_path / "q.fq"
    fq.write_text(f"@r\n{km}\n+\n{'I' * len(km)}\n")
    out = tmp_path / "o.fq"
    assert tools_cli.main(["filter", "-t", db1, str(fq), "-ci0.5",
                           str(out)]) == 1
    assert "not compatibile" in capsys.readouterr().err
    # -t then -hm: the last mode wins (byte-equal to plain -hm)
    a, b = tmp_path / "a.fq", tmp_path / "b.fq"
    assert tools_cli.main(["filter", "-t", "-hm", db1, str(fq), "-ci5",
                           str(a)]) == 0
    assert tools_cli.main(["filter", "-hm", db1, str(fq), "-ci5",
                           str(b)]) == 0
    assert a.read_text() == b.read_text()


def test_filter_list_input_and_format_rules(two_dbs, tmp_path, capsys):
    """@list expands to several filter inputs written to ONE output in
    order (parameters_parser.cpp:106-124); -fa input + -fq output is a
    parse-time error (:193-197)."""
    db1, _, c1, _ = two_dbs
    kms = [km for km, c in c1.items() if c >= 2]
    q1, q2 = tmp_path / "q1.fq", tmp_path / "q2.fq"
    q1.write_text(f"@a\n{kms[0]}\n+\n{'I' * 21}\n")
    q2.write_text(f"@b\n{kms[1]}\n+\n{'I' * 21}\n")
    lst = tmp_path / "inputs.lst"
    lst.write_text(f"{q1}\n{q2}\n")
    out = tmp_path / "o.fq"
    assert tools_cli.main(["filter", db1, f"@{lst}", "-ci1",
                           str(out)]) == 0
    assert out.read_text() == q1.read_text() + q2.read_text()
    # missing list file
    assert tools_cli.main(["filter", db1, "@/nonexistent.lst",
                           str(out)]) == 1
    # -fa input + -fq output rejected at parse time
    assert tools_cli.main(["filter", db1, str(q1), "-fa",
                           str(out), "-fq"]) == 1
    assert "cannot set -fq" in capsys.readouterr().err


def test_transform_sort_on_kmc1_omitted(two_dbs, tmp_path, capsys):
    """sort of an already-sorted KMC1 database is omitted with a warning
    and produces no output (kmc_tools.cpp:421-432); other ops in the same
    invocation still run."""
    db1, db2, c1, c2 = two_dbs
    u = str(tmp_path / "u")  # simple outputs are KMC1 databases
    assert tools_cli.main(["simple", db1, db2, "union", u]) == 0
    s = str(tmp_path / "s")
    h = str(tmp_path / "h")
    assert tools_cli.main(["transform", u, "sort", s,
                           "histogram", h]) == 0
    err = capsys.readouterr().err
    assert "already sorted" in err
    assert not (tmp_path / "s.kmc_pre").exists()
    assert (tmp_path / "h").exists()  # histogram still ran
    # KMC2 inputs still sort
    s2 = str(tmp_path / "s2")
    assert tools_cli.main(["transform", db1, "sort", s2]) == 0
    assert (tmp_path / "s2.kmc_pre").exists()


def test_simple_oc_mode_after_output(two_dbs, tmp_path):
    """-oc<mode> placed among the output params (the reference's only
    accepted position) must equal the pre-output position."""
    db1, db2, _, _ = two_dbs
    a = str(tmp_path / "pre")
    b = str(tmp_path / "post")
    assert tools_cli.main(["simple", db1, db2, "intersect", "-ocsum", a]) == 0
    assert tools_cli.main(["simple", db1, db2, "intersect", b, "-ocsum"]) == 0
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(a + suf, "rb") as fa, open(b + suf, "rb") as fb:
            assert fa.read() == fb.read()


def test_filter_db_cutoffs_and_fasta_output(two_dbs, tmp_path):
    """DB-side -ci/-cx restrict which k-mers count as present
    (SetMinCount/SetMaxCount, kmc_tools.cpp:307-308); -fa converts FASTQ
    records to FASTA output."""
    db1, _, c1, _ = two_dbs
    # craft reads: one made of db1 k-mers (all counters >= 1), one foreign
    genome_kmers = [km for km, c in c1.items() if c >= 2]
    rare_kmers = [km for km, c in c1.items() if c == 1]
    assert genome_kmers and rare_kmers
    fq = tmp_path / "q.fq"
    with open(fq, "w") as f:
        f.write(f"@common\n{genome_kmers[0]}\n+\n{'I' * 21}\n")
        f.write(f"@rare\n{rare_kmers[0]}\n+\n{'I' * 21}\n")
    # db -ci2: the rare read's single k-mer reads as absent -> dropped
    out = tmp_path / "o.fq"
    assert tools_cli.main(["filter", db1, "-ci2", str(fq), "-ci1",
                           str(out)]) == 0
    text = out.read_text()
    assert "@common" in text and "@rare" not in text
    # no db cut: both reads pass
    out2 = tmp_path / "o2.fq"
    assert tools_cli.main(["filter", db1, str(fq), "-ci1", str(out2)]) == 0
    assert "@rare" in out2.read_text()
    # -fa output: FASTQ records emitted as FASTA
    fa = tmp_path / "o.fa"
    assert tools_cli.main(["filter", db1, str(fq), "-ci1", str(fa),
                           "-fa"]) == 0
    fa_text = fa.read_text()
    assert fa_text.startswith(">common\n")
    assert "+" not in fa_text and "@" not in fa_text  # no quality blocks
    assert fa_text.count(">") == 2


def test_filter_bytes_fast_path_equivalence(two_dbs, tmp_path, monkeypatch):
    """The chunked bytes fast path (remove mode) must byte-match the
    legacy per-record text path on every input shape — incl. CRLF line
    endings, trailing whitespace, '+'-with-id separators, short reads,
    missing trailing newline, empty sequence lines, fractional bounds,
    FASTQ->FASTA conversion, and partial trailing records — at chunk
    sizes that force record and CR splits across chunk boundaries."""
    import kmc_tpu.tools.fastq_filter as ff

    db1, _, c1, _ = two_dbs
    kms = [km for km, c in c1.items() if c >= 2][:40]
    plain = "".join(f"@q{i}\n{km}\n+\n{'I' * len(km)}\n"
                    for i, km in enumerate(kms))
    keep = dict(min_kmers=1)  # each read holds ONE k-mer (a db1 member):
    # min_kmers=1 keeps them, so the verbatim byte-span path really runs
    cases = {
        "plain": (plain, keep),
        "crlf": (plain.replace("\n", "\r\n"), keep),
        "trailws": ("".join(f"@q{i} \n{km}  \n+\n{'I' * len(km)}\n"
                            for i, km in enumerate(kms)), keep),
        "plusid": ("".join(f"@q{i}\n{km}\n+q{i}\n{'I' * len(km)}\n"
                           for i, km in enumerate(kms)), keep),
        "short": ("@s\nACGTACGT\n+\nIIIIIIII\n" + plain, keep),
        "notrail": (plain.rstrip("\n"), keep),
        "fasta": ("".join(f">q{i}\n{km}\n" for i, km in enumerate(kms)),
                  keep),
        "emptyseq": ("@e0\n\n+\n\n" + plain, keep),
        "dropall": (plain, {}),  # default min_kmers=2 drops every read
        "mixed": (plain, dict(min_kmers=0.5, max_kmers=1.0)),
        "frac": (plain, dict(min_kmers=0.3, max_kmers=1.0)),
        "fq2fa": (plain, dict(out_format="a", min_kmers=1)),
        "partialtail": (plain + "@tail\nACGTACGT", keep),
        "trim": (plain, dict(min_kmers=2, trim=True)),
        "trim_crlf": (plain.replace("\n", "\r\n"),
                      dict(min_kmers=2, trim=True)),
        "hm": (plain, dict(min_kmers=2, hard_mask=True)),
        "hm_short": ("@s\nACGTACGT\n+\nIIIIIIII\n" + plain,
                     dict(min_kmers=2, hard_mask=True)),
        "trim2fa": (plain, dict(min_kmers=2, trim=True, out_format="a")),
        "hm_fasta": ("".join(f">q{i}\n{km}\n"
                             for i, km in enumerate(kms)),
                     dict(min_kmers=2, hard_mask=True)),
        # member prefix + foreign tail: later windows miss the DB, so
        # trim really truncates and hard-mask really masks mid-read
        "trim_cut": ("".join(f"@c{i}\n{km}TTTTTTTTAA\n+\n{'I' * 41}\n"
                             for i, km in enumerate(kms)),
                     dict(min_kmers=2, trim=True)),
        "hm_cut": ("".join(f"@c{i}\n{km}TTTTTTTTAA\n+\n{'I' * 41}\n"
                           for i, km in enumerate(kms)),
                   dict(min_kmers=2, hard_mask=True)),
        "hm_mid": ("".join(f"@m{i}\nGG{km}CC\n+\n{'I' * 25}\n"
                           for i, km in enumerate(kms)),
                   dict(min_kmers=2, hard_mask=True)),
        # malformed: qual shorter than seq — trim's qual[:L] must clip
        "trim_shortqual": ("".join(
            f"@s{i}\n{km}TTTTTTTTAA\n+\n{'I' * 10}\n"
            for i, km in enumerate(kms)), dict(min_kmers=2, trim=True)),
        "hm2fa": ("".join(f"@c{i}\n{km}TTTTTTTTAA\n+\n{'I' * 41}\n"
                          for i, km in enumerate(kms)),
                  dict(min_kmers=2, hard_mask=True, out_format="a")),
        # regression (round-5 ADVICE): reads whose FIRST bad window is
        # their LAST window, followed by trailing no-window (len<k)
        # records — the old reduceat boundary clip excluded the previous
        # record's last window from its first-bad-window min, so trim
        # kept the full read instead of truncating
        "trim_tailnk0": ("".join(f"@t{i}\n{km}A\n+\n{'I' * 22}\n"
                                 for i, km in enumerate(kms))
                         + "@tail\nACG\n+\nIII\n@tail2\nAC\n+\nII\n",
                         dict(min_kmers=2, trim=True)),
    }
    from kmc_tpu.tools.fastq_filter import filter_fastq
    for chunk in (8 << 20, 61):
        monkeypatch.setattr(ff, "_CHUNK", chunk)
        for name, (content, kw) in cases.items():
            inp = tmp_path / f"{name}.in"
            with open(inp, "w", newline="") as f:
                f.write(content)
            res = {}
            for fast in ("1", "0"):
                monkeypatch.setenv("KMC_TPU_FILTER_BYTES", fast)
                out = tmp_path / f"{name}.{fast}.out"
                counts = filter_fastq(db1, str(inp), str(out), **kw)
                res[fast] = (counts, out.read_bytes())
            assert res["1"] == res["0"], (name, chunk)
    # gzip input + gzip output + multi-input list through both paths
    import gzip

    gz_in = tmp_path / "q.fq.gz"
    with gzip.open(gz_in, "wt") as f:
        f.write(plain)
    q2 = tmp_path / "q2.fq"
    q2.write_text(plain.replace("@q", "@r"))
    res = {}
    for fast in ("1", "0"):
        monkeypatch.setenv("KMC_TPU_FILTER_BYTES", fast)
        out = tmp_path / f"gz.{fast}.out.gz"
        counts = filter_fastq(db1, [str(gz_in), str(q2)], str(out),
                               min_kmers=1)
        with gzip.open(out, "rb") as f:
            res[fast] = (counts, f.read())
    assert res["1"] == res["0"]
    assert res["1"][1].startswith(b"@q") and b"@r" in res["1"][1]


def test_complex_streaming_path_equivalence(two_dbs, tmp_path, monkeypatch):
    """The bounded-memory streaming complex evaluator (native off, stream
    threshold 0) must byte-match the in-memory evaluator (regression: the
    streaming path previously had no direct coverage)."""
    db1, db2, _, _ = two_dbs
    from kmc_tpu.tools.complex_ops import run_complex_file

    outs = {}
    for tag, env in (("mem", {"KMC_TPU_NATIVE_TOOLS": "0",
                              "KMC_TPU_STREAM_THRESHOLD": str(1 << 60)}),
                     ("stream", {"KMC_TPU_NATIVE_TOOLS": "0",
                                 "KMC_TPU_STREAM_THRESHOLD": "0"})):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        out = tmp_path / f"cxs_{tag}"
        ops_file = tmp_path / f"ops_{tag}.txt"
        ops_file.write_text(
            f"INPUT:\na = {db1} -ci2\nb = {db2}\n"
            f"OUTPUT:\n{out} = (a - b) + (a *max b)\n")
        run_complex_file(str(ops_file))
        outs[tag] = out
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(str(outs["mem"]) + suf, "rb") as fa, \
                open(str(outs["stream"]) + suf, "rb") as fb:
            assert fa.read() == fb.read(), suf


def test_filter_bytes_fast_path_fuzz(two_dbs, tmp_path, monkeypatch):
    """Randomized differential: random record shapes (lengths, line
    endings, whitespace, N runs, short/empty reads) x random modes
    through the fast and legacy paths must agree byte-for-byte."""
    import random
    import kmc_tpu.tools.fastq_filter as ff
    from kmc_tpu.tools.fastq_filter import filter_fastq

    db1, _, c1, _ = two_dbs
    kms = [km for km, c in c1.items() if c >= 2]
    rng = random.Random(99)
    for trial in range(12):
        recs = []
        for i in range(rng.randrange(1, 30)):
            r = rng.random()
            if r < 0.5:
                seq = rng.choice(kms)
            elif r < 0.7:
                seq = "".join(rng.choice("ACGTN")
                              for _ in range(rng.randrange(0, 70)))
            else:
                seq = rng.choice(kms) + "".join(
                    rng.choice("ACGT") for _ in range(rng.randrange(0, 30)))
            ws = " " * rng.randrange(0, 2)
            recs.append(f"@r{i}{ws}\n{seq}\n+\n{'I' * len(seq)}\n")
        content = "".join(recs)
        if rng.random() < 0.3:
            content = content.replace("\n", "\r\n")
        if rng.random() < 0.3:
            content = content.rstrip("\n")
        mode = rng.choice(["remove", "trim", "hm"])
        kw = {"remove": dict(min_kmers=rng.choice([1, 2, 0.5]),
                             max_kmers=rng.choice([3, 10**9, 1.0])),
              "trim": dict(min_kmers=rng.choice([1, 2]), trim=True),
              "hm": dict(min_kmers=rng.choice([1, 2]), hard_mask=True),
              }[mode]
        if isinstance(kw.get("min_kmers"), float) or \
                isinstance(kw.get("max_kmers"), float):
            kw.pop("trim", None), kw.pop("hard_mask", None)
        inp = tmp_path / f"fz{trial}.fq"
        with open(inp, "w", newline="") as f:
            f.write(content)
        monkeypatch.setattr(ff, "_CHUNK",
                            rng.choice([8 << 20, 256, 61]))
        res = {}
        for fast in ("1", "0"):
            monkeypatch.setenv("KMC_TPU_FILTER_BYTES", fast)
            out = tmp_path / f"fz{trial}.{fast}.out"
            counts = filter_fastq(db1, str(inp), str(out), **kw)
            res[fast] = (counts, out.read_bytes())
        assert res["1"] == res["0"], (trial, mode)


def test_filter_pipeline_threads_byte_identical(two_dbs, tmp_path,
                                                monkeypatch):
    """The reader/filter/writer stage pipeline (-t != 1) produces
    byte-identical output to the serial loop (-t1), across modes, gz
    input, multiple inputs, and tiny chunks forcing many queue items
    (reference pipeline: kmc_tools.cpp:226-345)."""
    import gzip as _gzip

    import kmc_tpu.tools.fastq_filter as ff
    from kmc_tpu.tools import native_tools

    if not native_tools.available():
        pytest.skip("native tools unavailable")
    db1, _, c1, _ = two_dbs
    kms = [km for km, c in c1.items() if c >= 2][:60]
    plain = "".join(f"@q{i}\n{km}TTTTAACC\n+\n{'I' * (len(km) + 8)}\n"
                    for i, km in enumerate(kms))
    fq = tmp_path / "in.fastq"
    fq.write_text(plain)
    gz = tmp_path / "in2.fastq.gz"
    gz.write_bytes(_gzip.compress(plain.encode()))

    monkeypatch.setattr(ff, "_CHUNK", 1 << 9)  # many pipeline items
    for mode in ({"min_kmers": 1}, {"min_kmers": 2, "trim": True},
                 {"min_kmers": 2, "hard_mask": True}):
        outs = {}
        for t in (1, 4, None):
            native_tools.set_threads(t)
            out = tmp_path / f"out_{t}.fastq"
            stats = ff.filter_fastq(db1, [str(fq), str(gz)], str(out),
                                    **mode)
            outs[t] = (out.read_bytes(), stats)
        native_tools.set_threads(None)
        assert outs[1] == outs[4] == outs[None], mode


def test_filter_pipeline_error_propagates(two_dbs, tmp_path, monkeypatch):
    """A mid-stream error (FASTA input with FASTQ output) raises through
    the pipeline threads without hanging."""
    import kmc_tpu.tools.fastq_filter as ff
    from kmc_tpu.tools import native_tools

    if not native_tools.available():
        pytest.skip("native tools unavailable")
    db1, _, c1, _ = two_dbs
    kms = [km for km, c in c1.items() if c >= 2][:10]
    fa = tmp_path / "in.fasta"
    fa.write_text("".join(f">q{i}\n{km}\n" for i, km in enumerate(kms)))
    native_tools.set_threads(4)
    try:
        with pytest.raises(ValueError, match="FASTA input"):
            ff.filter_fastq(db1, str(fa), str(tmp_path / "o.fastq"),
                            min_kmers=1, out_format="q")
    finally:
        native_tools.set_threads(None)
