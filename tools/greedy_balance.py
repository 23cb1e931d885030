#!/usr/bin/env python
"""Greedy signature-map balance fidelity (VERDICT r4 next #10): build the
map on real sampled stage-0 stats and on adversarial synthetic stats, and
report the per-bin load distribution (max/mean = the stage-2 critical-path
stretch) for:

  prefix    the default shift map (bin = top bits of signature)
  greedy    signatures.build_signature_map — the reference's algorithm
            with its exact skip-scan group fill (s_mapper.h:164-226);
            the one residual difference vs the reference BINARY is the
            tie order of its unstable std::sort (documented in the
            docstring)
  oracle    a list-based literal transcription of the reference's fill
            run on the same stable-sorted order — proves the vectorized
            fill matches the reference semantics entry-for-entry

Usage: python tools/greedy_balance.py [fastq...]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def reference_fill_oracle(counts: np.ndarray, sig_len: int,
                          n_bins: int) -> np.ndarray:
    """Literal list transcription of s_mapper.h:164-226 over the SAME
    stable descending order build_signature_map uses."""
    from kmc_tpu.signatures import is_allowed, map_size, special_signature

    msize = map_size(sig_len)
    sig_map = np.full(msize, -1, np.int32)
    allowed = is_allowed(np.arange(msize - 1, dtype=np.uint32), sig_len)
    order = np.argsort(-counts.astype(np.int64), kind="stable")
    order = order[allowed[order]]
    stats = [(int(s), float(counts[s]) + 1000.0) for s in order]
    total = sum(w for _, w in stats)
    mean = total / n_bins
    max_bin_size = 1.1 * mean
    bin_no = 0
    max_bins = n_bins - 1
    n = max_bins
    while len(stats) > n:
        s0, w0 = stats[0]
        if w0 > mean:
            sig_map[s0] = bin_no
            bin_no += 1
            total -= w0
            stats.pop(0)
            n -= 1
        else:
            tmp = 0.0
            keep = []
            i = 0
            while i < len(stats):
                if stats and tmp + stats[-1][1] >= max_bin_size:
                    break
                if tmp + stats[i][1] < max_bin_size:
                    tmp += stats[i][1]
                    keep.append(stats.pop(i))
                else:
                    i += 1
            for s, _ in keep:
                sig_map[s] = bin_no
            bin_no += 1
            n -= 1
            total -= tmp
        denom = max_bins - bin_no
        mean = total / denom if denom else float("inf")
        max_bin_size = 1.1 * mean
    for s, _ in stats:
        sig_map[s] = bin_no
        bin_no += 1
    sig_map[special_signature(sig_len)] = bin_no
    return sig_map


def balance(sig_map: np.ndarray, counts: np.ndarray) -> dict:
    n_bins = int(sig_map.max()) + 1
    loads = np.zeros(n_bins, np.float64)
    sel = sig_map[:-1] >= 0
    np.add.at(loads, sig_map[:-1][sel], counts[sel].astype(np.float64))
    nz = loads[loads > 0]
    return {
        "n_bins_used": n_bins,
        "max_over_mean": round(float(loads.max() / max(loads.mean(), 1)), 3),
        "p99_over_mean": round(
            float(np.percentile(loads, 99) / max(loads.mean(), 1)), 3),
        "empty_bins": int((loads == 0).sum()),
        "nz_max_over_nz_mean": round(
            float(nz.max() / nz.mean()) if len(nz) else 0.0, 3),
    }


def prefix_map(sig_len: int, n_bins: int) -> np.ndarray:
    from kmc_tpu.ops.store import prefix_bin_bits, prefix_sig_map

    bits, _ = prefix_bin_bits(27, sig_len, n_bins)
    return prefix_sig_map(sig_len, bits)


def sampled_stats(paths, sig_len: int) -> np.ndarray:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kmc_tpu import defs
    from kmc_tpu.io.native import pack_codes
    from kmc_tpu.io.readers import BatchStream, ParseState, file_code_stream
    from kmc_tpu.ops.extract import stage0_stats_accum
    from kmc_tpu.signatures import map_size

    s = 1 << 16
    bs = BatchStream(s, 27)
    dev = jnp.zeros((map_size(sig_len),), jnp.uint32)
    gen = file_code_stream(paths, "fastq", ParseState(),
                           max_bytes=defs.STATS_SAMPLE_BYTES)
    for batch in bs.batches(gen):
        packed, mask = pack_codes(batch)
        dev = stage0_stats_accum(packed, mask, dev, s=s, k=27, sig_len=sig_len)
    return np.asarray(dev, np.uint64)


def main():
    from kmc_tpu.signatures import build_signature_map, map_size

    sig_len, n_bins = 9, 512
    cases = {}
    if len(sys.argv) > 1:
        counts = sampled_stats(sys.argv[1:], sig_len)[: map_size(sig_len) - 1]
        cases["sampled_input"] = counts
    rng = np.random.default_rng(7)
    m1 = map_size(sig_len) - 1
    cases["uniform"] = rng.integers(0, 1000, m1).astype(np.uint64)
    zipf = (1e6 / (1 + np.arange(m1, dtype=np.float64))).astype(np.uint64)
    rng.shuffle(zipf)
    cases["zipf_heavy_head"] = zipf
    spike = np.zeros(m1, np.uint64)
    spike[rng.integers(0, m1, 40)] = 10_000_000
    cases["forty_hot_signatures"] = spike

    report = {}
    for name, counts in cases.items():
        ours = build_signature_map(counts, sig_len, n_bins)
        oracle = reference_fill_oracle(counts, sig_len, n_bins)
        match = bool(np.array_equal(ours, oracle))
        report[name] = {
            "greedy_fill_matches_reference_oracle": match,
            "greedy": balance(ours, counts),
            "prefix": balance(prefix_map(sig_len, n_bins), counts),
        }
        print(name, json.dumps(report[name]), flush=True)
        assert match, f"vectorized fill diverges from the oracle on {name}"
    out = Path(__file__).resolve().parent.parent / "GREEDY_BALANCE.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
