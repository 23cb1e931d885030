"""kmc_tools CLI equivalent (reference: kmc_tools/kmc_tools.cpp,
parameters_parser.cpp:608-632).

Modes: transform, simple, complex, compare, info, check, filter.
"""
from __future__ import annotations

import sys


from .tools import db_ops
from .tools.db_ops import OutputParams

USAGE = """kmc_tools (kmc_tpu) — database algebra on KMC databases
Usage: kmc_tools <operation> [operation parameters]
Operations:
  transform <db> [-ci<v>] [-cx<v>] <oper [oper_params] output> [...]
      opers: sort, reduce, compact, histogram, dump [-s], set_counts <value>
  simple <db1 [-ci<v>] [-cx<v>]> <db2 [-ci<v>] [-cx<v>]>
         <oper [-oc<mode>] output [-ci<v>] [-cx<v>] [-cs<v>]> [...]
      opers: intersect, union, kmers_subtract, counters_subtract,
             reverse_kmers_subtract, reverse_counters_subtract
      -oc<min|max|sum|diff|left|right> - counter calculation mode
  complex <operations_definition_file>
  compare <db1> <db2>
  info <db>
  check <db> <kmer>
  filter [-t] <kmc_db> <input_fastq> [-ci<v>] [-cx<v>] <output_fastq>
"""


def _parse_input_cut(args, i):
    """Consume per-input -ci/-cx tokens at position i (the reference's
    input_params, parameters_parser.cpp:842-848 default the unset ones
    from the input header).  Returns ((ci|None, cx|None), next_i)."""
    ci = cx = None
    while i < len(args) and (args[i].startswith("-ci")
                             or args[i].startswith("-cx")):
        if args[i].startswith("-ci"):
            ci = int(args[i][3:])
        else:
            cx = int(args[i][3:])
        i += 1
    return (ci, cx), i


def _parse_out_overrides(args):
    """Explicit per-output -ci/-cx/-cs values as an overrides dict; unset
    keys take the reference's input-derived defaults
    (db_ops.default_output_params)."""
    ov = {}
    for a in args:
        if a.startswith("-ci"):
            ov["ci"] = int(a[3:])
        elif a.startswith("-cx"):
            ov["cx"] = int(a[3:])
        elif a.startswith("-cs"):
            ov["cs"] = int(a[3:])
    return ov


def _parse_output_params(args, defaults=None):
    p = defaults or OutputParams()
    rest = []
    for a in args:
        if a.startswith("-ci"):
            p.cutoff_min = int(a[3:])
        elif a.startswith("-cx"):
            p.cutoff_max = int(a[3:])
        elif a.startswith("-cs"):
            p.counter_max = int(a[3:])
        else:
            rest.append(a)
    return p, rest


def cmd_transform(args) -> int:
    if len(args) < 2:
        print(USAGE)
        return 1
    db = args[0]
    in_cut, i = _parse_input_cut(args, 1)
    while i < len(args):
        op = args[i]
        i += 1
        if op == "sort":
            out = args[i]
            i += 1
            opts = []
            while i < len(args) and args[i].startswith("-"):
                opts.append(args[i])
                i += 1
            db_ops.transform_sort(db, out, _parse_out_overrides(opts),
                                  in_cut=in_cut)
        elif op == "reduce":
            # reduce <output> [-ci -cx -cs]
            out = args[i]
            i += 1
            opts = []
            while i < len(args) and args[i].startswith("-"):
                opts.append(args[i])
                i += 1
            db_ops.transform_reduce(db, out, _parse_out_overrides(opts),
                                    in_cut=in_cut)
        elif op == "compact":
            db_ops.transform_compact(db, args[i], in_cut=in_cut)
            i += 1
        elif op == "histogram":
            out = args[i]
            i += 1
            lo, hi = None, None  # unset -> reference input-derived defaults
            while i < len(args) and args[i].startswith("-"):
                if args[i].startswith("-ci"):
                    lo = int(args[i][3:])
                elif args[i].startswith("-cx"):
                    hi = int(args[i][3:])
                i += 1
            db_ops.transform_histogram(db, out, lo, hi, in_cut=in_cut)
        elif op == "dump":
            sorted_out = False
            if i < len(args) and args[i] == "-s":
                sorted_out = True
                i += 1
            db_ops.transform_dump(db, args[i], sorted_out, in_cut=in_cut)
            i += 1
        elif op == "set_counts":
            value = int(args[i])
            out = args[i + 1]
            db_ops.transform_set_counts(db, out, value, in_cut=in_cut)
            i += 2
        else:
            print(f"Error: unknown transform operation {op}", file=sys.stderr)
            return 1
    return 0


def cmd_simple(args) -> int:
    if len(args) < 4:
        print(USAGE)
        return 1
    db1 = args[0]
    in1_cut, i = _parse_input_cut(args, 1)
    db2 = args[i]
    in2_cut, i = _parse_input_cut(args, i + 1)
    ops = []
    while i < len(args):
        op = args[i]
        i += 1
        if op not in db_ops.SIMPLE_OPS:
            print(f"Error: unknown simple operation {op}", file=sys.stderr)
            return 1
        mode = None
        if i < len(args) and args[i].startswith("-oc"):
            mode = args[i][3:]
            i += 1
        out = args[i]
        i += 1
        opts = []
        while i < len(args) and args[i].startswith("-"):
            opts.append(args[i])
            i += 1
        ops.append((op, mode, out, _parse_out_overrides(opts)))
    # every output computed from ONE load + merge of the inputs
    db_ops.run_simple_ops(db1, db2, ops, in1_cut=in1_cut, in2_cut=in2_cut)
    return 0


def cmd_compare(args) -> int:
    if len(args) != 2:
        print(USAGE)
        return 1
    equal = db_ops.db_compare(args[0], args[1])
    # reference prints nothing; exit code 0 = equal, 1 = different
    return 0 if equal else 1


def cmd_info(args) -> int:
    if len(args) != 1:
        print(USAGE)
        return 1
    sys.stdout.write(db_ops.db_info_text(args[0]))
    return 0


def cmd_check(args) -> int:
    if len(args) != 2:
        print(USAGE)
        return 1
    from .api import KMCFile

    f = KMCFile()
    if not f.OpenForRA(args[0]):
        print("Error: cannot open database", file=sys.stderr)
        return 1
    found, count = f.CheckKmer(args[1])
    print(count if found else 0)
    return 0 if found else 1


def cmd_filter(args) -> int:
    from .tools.fastq_filter import filter_fastq

    trim = False
    hard_mask = False
    if args and args[0] == "-t":
        trim = True
        args = args[1:]
    if args and args[0] == "-hm":
        hard_mask = True
        args = args[1:]
    if len(args) < 3:
        print(USAGE)
        return 1
    db = args[0]
    inp = args[1]
    # reference read-side defaults: -ci2 -cx1e9 (absolute counts); a value
    # written WITH a decimal point is a fraction of the read's k-mer count
    # (fastq_filter help: "integer or floating number in range [0.0;1.0]")
    fci: int | float = 2
    fcx: int | float = 10**9

    def _num(s):
        # a decimal point marks a fraction (reference syntax rule); plain
        # and scientific-notation integers (2, 1e9) are absolute counts
        return float(s) if "." in s else int(float(s))

    rest = []
    for a in args[2:]:
        if a.startswith("-ci"):
            fci = _num(a[3:])
        elif a.startswith("-cx"):
            fcx = _num(a[3:])
        else:
            rest.append(a)
    if len(rest) != 1:
        print(USAGE)
        return 1
    out = rest[0]
    filter_fastq(db, inp, out, min_kmers=fci, max_kmers=fcx, trim=trim,
                 hard_mask=hard_mask)
    return 0


def cmd_complex(args) -> int:
    if len(args) != 1:
        print(USAGE)
        return 1
    from .tools.complex_ops import run_complex_file

    run_complex_file(args[0])
    return 0


COMMANDS = {
    "transform": cmd_transform,
    "simple": cmd_simple,
    "compare": cmd_compare,
    "info": cmd_info,
    "check": cmd_check,
    "filter": cmd_filter,
    "complex": cmd_complex,
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("--help", "-h"):
        print(USAGE)
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"Error: unknown operation {cmd}", file=sys.stderr)
        print(USAGE)
        return 1
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
