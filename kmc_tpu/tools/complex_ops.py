"""kmc_tools `complex` mode: set-algebra expressions over databases.

File grammar (reference kmc_tools/parser.cpp:39-120, tokenizer.cpp:20-26):

    INPUT:
    name1 = /path/to/db [-ci<v>] [-cx<v>]
    name2 = ...
    OUTPUT:
    /path/out = name1 + name2 * (name1 - name2)
    OUTPUT_PARAMS:
    -ci<v> -cx<v> -cs<v>

Operators (ascending precedence: +,- then ~ then *):
    +  union           (counter: sum)
    -  kmers subtract
    ~  counters subtract (counter: diff)
    *  intersection    (counter: min)
An operator may carry an explicit counter mode, e.g. `a +max b`
(output_parser.h): one of min/max/sum/diff/left/right.
"""
from __future__ import annotations

import re

import numpy as np

from . import db_ops
from .db_ops import OutputParams


class _Tok:
    def __init__(self, kind, value=None):
        self.kind = kind
        self.value = value


def _tokenize(expr: str):
    pos = 0
    toks = []
    pat = re.compile(
        r"\s*(?:(?P<lp>\()|(?P<rp>\))|(?P<op>[+\-~*])(?P<mode>min|max|sum|diff|left|right)?|(?P<name>\w+))"
    )
    while pos < len(expr):
        m = pat.match(expr, pos)
        if not m:
            raise ValueError(f"cannot parse expression at: {expr[pos:]}")
        pos = m.end()
        if m.group("lp"):
            toks.append(_Tok("("))
        elif m.group("rp"):
            toks.append(_Tok(")"))
        elif m.group("op"):
            toks.append(_Tok("op", (m.group("op"), m.group("mode"))))
        else:
            toks.append(_Tok("name", m.group("name")))
    return toks


_DEFAULT_MODE = {"+": "sum", "*": "min", "~": "diff", "-": None}
_OP_FN = {
    "+": db_ops.op_union,
    "*": db_ops.op_intersect,
    "-": db_ops.op_kmers_subtract,
    "~": db_ops.op_counters_subtract,
}
# precedence per reference expression_node construction: * binds tightest,
# then ~, then +/- left-associative
_PREC = {"+": 1, "-": 1, "~": 2, "*": 3}


class _Parser:
    def __init__(self, toks, inputs):
        self.toks = toks
        self.pos = 0
        self.inputs = inputs

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def parse(self, min_prec=1):
        left = self.parse_atom()
        while True:
            t = self.peek()
            if t is None or t.kind != "op":
                break
            op, mode = t.value
            if _PREC[op] < min_prec:
                break
            self.pos += 1
            right = self.parse(_PREC[op] + 1)
            fn = _OP_FN[op]
            if op == "-":
                left = fn(left[0], left[1], right[0], right[1])
            else:
                left = fn(left[0], left[1], right[0], right[1], mode or _DEFAULT_MODE[op])
        return left

    def parse_atom(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        if t.kind == "(":
            self.pos += 1
            v = self.parse()
            if self.peek() is None or self.peek().kind != ")":
                raise ValueError("missing )")
            self.pos += 1
            return v
        if t.kind == "name":
            self.pos += 1
            if t.value not in self.inputs:
                raise ValueError(f"undefined input {t.value}")
            return self.inputs[t.value]
        raise ValueError(f"unexpected token in expression")


def evaluate_expression(expr: str, inputs: dict):
    """inputs: name -> (kmers, counts). Returns (kmers, counts)."""
    return _Parser(_tokenize(expr), inputs).parse()


def run_complex_file(path: str):
    lines = [ln.strip() for ln in open(path)]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    section = None
    inputs = {}
    input_params = {}
    output_line = None
    out_params_tokens = []
    for ln in lines:
        up = ln.upper()
        if up.startswith("INPUT:"):
            section = "input"
            continue
        if up.startswith("OUTPUT:"):
            section = "output"
            continue
        if up.startswith("OUTPUT_PARAMS:"):
            section = "output_params"
            continue
        if section == "input":
            m = re.match(r"^\s*([\w+-]+)\s*=\s*(.*)$", ln)
            if not m:
                raise ValueError(f"bad input line: {ln}")
            name = m.group(1)
            parts = m.group(2).split()
            path_db = parts[0]
            p = OutputParams()
            for tok in parts[1:]:
                if tok.startswith("-ci"):
                    p.cutoff_min = int(tok[3:])
                elif tok.startswith("-cx"):
                    p.cutoff_max = int(tok[3:])
            info, kmers, counts = db_ops.load_sorted(path_db)
            keep = (counts >= p.cutoff_min) & (counts <= p.cutoff_max)
            inputs[name] = (kmers[keep], counts[keep].astype(np.uint64))
            input_params[name] = info
        elif section == "output":
            if output_line is None:
                output_line = ln
        elif section == "output_params":
            out_params_tokens.extend(ln.split())
    if output_line is None:
        raise ValueError("no OUTPUT: line")
    m = re.match(r"^\s*(.*?)\s*=\s*(.*)$", output_line)
    if not m:
        raise ValueError(f"bad output line: {output_line}")
    out_path, expr = m.group(1).strip(), m.group(2)
    kmers, counts = evaluate_expression(expr, inputs)
    p, _ = _parse_out_params(out_params_tokens)
    kmers, counts = p.apply(kmers, counts)
    some_info = next(iter(input_params.values()))
    db_ops.write_sorted_db(out_path, some_info.kmer_len, kmers, counts, p,
                           some_info.both_strands)
    return out_path


def _parse_out_params(tokens):
    p = OutputParams()
    rest = []
    for tok in tokens:
        if tok.startswith("-ci"):
            p.cutoff_min = int(tok[3:])
        elif tok.startswith("-cx"):
            p.cutoff_max = int(tok[3:])
        elif tok.startswith("-cs"):
            p.counter_max = int(tok[3:])
        else:
            rest.append(tok)
    return p, rest
