"""Orchestrator: the two-stage counting pipeline and its public API.

API mirrors the reference's KMC::Runner / Stage1Params / Stage2Params fluent
interface (/root/reference/kmc_core/kmc_runner.h:100-255, kmc_runner.cpp:
179-403 for validation ranges), re-architected for TPU:

  stage 0  sampled signature histogram (device) -> greedy bin map (host)
  stage 1  code-stream batches -> device extract/canonicalize/sort/RLE ->
           host buckets per signature bin (HBM->host staging replaces the
           reference's temp-file spill)
  stage 2  per-bin device merge-sort + segment-reduce + cutoffs -> KMC2 DB
  small-k  k<=13: dense 4^k device histogram -> KMC1 DB
           (reference kmc.h:677-970)
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Optional

import numpy as np

from . import defs
from .defs import calc_counter_size
from .formats.kmc_db import DbInfo, Kmc2DbWriter, pick_lut_prefix_len, write_kmc1_db
from .io.readers import (
    BatchStream,
    ParseState,
    file_code_stream,
    homopolymer_compress_codes,
    parallel_code_stream,
)
from .signatures import build_signature_map, map_size
from .io.native import pack_codes, pack_codes_boundaries, pack_codes_fused
from .ops.extract import INVALID_SIG, stage1_batch_packed
from .ops.sortcount import merge_count_bin
from .ops.smallk import smallk_batch_packed, smallk_histogram_shape


class InputFileType(Enum):
    FASTQ = "fastq"
    FASTA = "fasta"
    MULTILINE_FASTA = "multifasta"
    BAM = "bam"
    KMC = "kmc"


class OutputFileType(Enum):
    KMC = "kmc"
    KFF = "kff"


class EstimateHistogramCfg(Enum):
    DONT_ESTIMATE = 0
    ESTIMATE_AND_COUNT_KMERS = 1
    ONLY_ESTIMATE = 2


class ILogger:
    """Verbose/warning log sink (reference kmc_runner.h:24-47)."""

    def log(self, message: str):  # pragma: no cover - interface default
        print(message)


class IProgressObserver:
    """Coarse step progress (reference IProgressObserver: stats splitter)."""

    def start(self, name: str):
        pass

    def step(self):
        pass

    def end(self):
        pass


class IPercentProgressObserver:
    """Percentage progress per stage (reference IPercentProgressObserver)."""

    def set_label(self, label: str):
        pass

    def set_progress(self, value: int):
        pass


def _fluent(cls):
    """Add reference-style SetX fluent setters for every dataclass field."""
    for name in cls.__dataclass_fields__:
        setter_name = "Set" + "".join(w.capitalize() for w in name.split("_"))

        def make(n):
            def setter(self, value):
                setattr(self, n, value)
                return self

            return setter

        setattr(cls, setter_name, make(name))
    return cls


@_fluent
@dataclass
class Stage1Params:
    input_files: list = field(default_factory=list)
    tmp_path: str = "."
    kmer_len: int = defs.DEFAULT_K
    n_threads: int = 0
    # -sf: parser/reader thread count; 0 = derive from n_threads
    # (reference: dedicated FASTQ reading threads, kmc.h:276-292)
    n_reader_threads: int = 0
    max_ram_gb: int = 12
    signature_len: int = defs.DEFAULT_SIGNATURE_LEN
    homopolymer_compressed: bool = False
    input_file_type: InputFileType = InputFileType.FASTQ
    canonical_kmers: bool = True
    ram_only_mode: bool = False
    n_bins: int = defs.DEFAULT_N_BINS
    estimate_histogram_cfg: EstimateHistogramCfg = EstimateHistogramCfg.DONT_ESTIMATE
    strict_memory_mode: bool = False
    verbose: bool = False
    # TPU-specific: candidate k-mer positions per device batch
    batch_positions: int = 1 << 22
    # TPU-specific: keep the k-mer store HBM-resident (spills to host RAM
    # only when the unique set outgrows device_store_rows); False forces the
    # host-staged per-bin bucket pipeline.  None = derive the rows from
    # max_ram_gb (memory.plan_memory — the reference's AdjustMemoryLimits,
    # kmc.h:427-507); an explicit value wins.
    device_store: bool = True
    device_store_rows: int | None = None
    # signature->bin policy for the device store: "prefix" (computed with a
    # shift; fastest) or "greedy" (the reference's sampled-histogram greedy
    # balance, s_mapper.h:141-235).  Either yields a valid self-describing
    # KMC2 database; see ops/store.py module docstring.
    signature_map_policy: str = "prefix"
    # observers (reference kmc_runner.h:24-93; injected like SetLogger /
    # SetPercentProgressObserver / SetProgressObserver)
    logger: object = None
    percent_progress_observer: object = None
    progress_observer: object = None

    def validate(self):
        if not (defs.MIN_K <= self.kmer_len <= defs.MAX_K):
            raise ValueError(f"k must be in [{defs.MIN_K},{defs.MAX_K}]")
        if not (defs.MIN_SL <= self.signature_len <= defs.MAX_SL):
            raise ValueError(f"signature length must be in [{defs.MIN_SL},{defs.MAX_SL}]")
        if not (defs.MIN_N_BINS <= self.n_bins <= defs.MAX_N_BINS):
            raise ValueError(f"n_bins must be in [{defs.MIN_N_BINS},{defs.MAX_N_BINS}]")
        if not self.input_files:
            raise ValueError("no input files")


@_fluent
@dataclass
class Stage2Params:
    max_ram_gb: int = 12
    n_threads: int = 0
    strict_memory_mode: bool = False
    cutoff_min: int = defs.DEFAULT_CUTOFF_MIN
    counter_max: int = defs.DEFAULT_COUNTER_MAX
    cutoff_max: int = defs.DEFAULT_CUTOFF_MAX
    output_file_name: str = ""
    output_file_type: OutputFileType = OutputFileType.KMC
    without_output: bool = False

    def validate(self):
        if self.cutoff_min < 1:
            raise ValueError("cutoff_min must be >= 1")
        if self.counter_max < 1:
            raise ValueError("counter_max must be >= 1")


@dataclass
class Stage1Results:
    time: float = 0.0
    n_sequences: int = 0
    was_small_k_opt_used: bool = False
    n_total_super_kmers: int = 0
    tmp_size: int = 0
    estimated_histogram: list = field(default_factory=list)


@dataclass
class Stage2Results:
    time: float = 0.0
    time_strict_mem: float = 0.0
    # device-only split (VERDICT r1 #8: track the machine, not the tunnel):
    # finalize execution vs the D2H transfer of the record payload
    time_finalize_exec: float = 0.0
    time_finalize_d2h: float = 0.0
    tmp_size_strict_memory: int = 0
    max_disk_usage: int = 0
    n_below_cutoff_min: int = 0
    n_above_cutoff_max: int = 0
    n_total_kmers: int = 0
    n_unique_kmers: int = 0


class Runner:
    """Two-stage k-mer counter (reference kmc_runner.h:246-255)."""

    def __init__(self):
        self._estimator = None
        self._estimated_histogram = None
        self._s1: Optional[Stage1Params] = None
        self._buckets = None  # bin -> list[(words uint32 (n,W), counts uint32)]
        self._bucket_rows = None
        self._bucket_occurrences = None
        self._sig_map = None
        self._n_used_bins = 0
        self._n_reads = 0
        self._smallk_hist = None
        self._small_k = False

    # ---------------- stage 1 ----------------
    def run_stage1(self, params: Stage1Params) -> Stage1Results:
        params.validate()
        self._s1 = params
        t0 = time.perf_counter()
        results = Stage1Results()

        k = params.kmer_len
        self._small_k = k <= 13
        self._estimator = None
        if params.estimate_histogram_cfg != EstimateHistogramCfg.DONT_ESTIMATE:
            if self._small_k:
                raise ValueError(
                    "histogram estimation not supported with small-k optimization"
                )  # mirrors kmc.h:779-785
            from .ops.nthash import NtCardEstimator

            # sampling prefix width by predicted input size (kmc.h:1118-1121:
            # s=7 under 50 GB, s=11 above — smaller s samples 16x more)
            predicted = sum(
                Path(p).stat().st_size for p in params.input_files
                if Path(p).exists()
            )
            self._estimator = NtCardEstimator(
                k, s=7 if predicted < 50_000_000_000 else 11)
        if params.estimate_histogram_cfg == EstimateHistogramCfg.ONLY_ESTIMATE:
            for chunk, _ in self._chunks(params):
                self._estimator.process_codes(chunk)
            results.estimated_histogram = self._estimator.estimate_histogram()
            self._estimated_histogram = results.estimated_histogram
        elif self._small_k:
            self._run_stage1_small_k(params, results)
        else:
            if not params.device_store:
                # host-staged buckets route by bin during stage 1, so the
                # map must exist upfront (the reference's stage-0 sampling);
                # the device-store path builds it from the full input as an
                # ingest side product instead
                self._run_stage0(params)
            self._run_stage1_bins(params, results)
            if self._estimator is not None:
                results.estimated_histogram = self._estimator.estimate_histogram()
                self._estimated_histogram = results.estimated_histogram

        results.n_sequences = self._n_reads
        results.was_small_k_opt_used = self._small_k
        results.time = time.perf_counter() - t0
        return results

    def _memory_plan(self, params: Stage1Params):
        """The -m carve for this run (memory.plan_memory); also applies
        the parse-chunk size to the native readers."""
        import os as _os

        from .io.readers import set_chunk_bytes
        from .memory import plan_memory

        try:
            auto = len(_os.sched_getaffinity(0))
        except AttributeError:
            auto = _os.cpu_count() or 1
        plan = plan_memory(
            params.max_ram_gb, k=params.kmer_len,
            batch_positions=params.batch_positions,
            n_threads=params.n_threads or auto,
            strict_memory=params.strict_memory_mode,
            requested_rows=params.device_store_rows)
        set_chunk_bytes(plan.parse_chunk_bytes)
        return plan

    def _chunks(self, params: Stage1Params, max_bytes=None):
        state = ParseState()
        fmt = params.input_file_type.value
        feed_estimator = (
            max_bytes is None
            and self._estimator is not None
            and params.estimate_histogram_cfg == EstimateHistogramCfg.ESTIMATE_AND_COUNT_KMERS
        )
        if fmt == "bam":
            import os as _os

            from .io.bam import bam_code_chunks

            try:
                auto = len(_os.sched_getaffinity(0))
            except AttributeError:
                auto = _os.cpu_count() or 1
            bam_threads = (params.n_reader_threads or params.n_threads
                           or auto)

            def gen():
                for path in params.input_files:
                    for codes, n_reads in bam_code_chunks(
                            path, params.canonical_kmers,
                            n_threads=bam_threads):
                        state.n_reads += n_reads
                        yield codes

            source = gen()
        elif fmt == "kmc":
            source = self._kmc_db_chunks(params, state)
        else:
            import os as _os

            try:  # respect cgroup/affinity limits, not the physical count
                auto = len(_os.sched_getaffinity(0))
            except AttributeError:
                auto = _os.cpu_count() or 1
            # -sf bounds the reader pool independently of -t
            n_th = params.n_reader_threads or params.n_threads or auto
            source = None
            if n_th > 1 and max_bytes is None:
                # N parser threads over file/byte-range shards (the
                # reference's reader/splitter pool, kmc.h:234-294); the
                # chunk stream is a boundary refinement of the serial one
                try:
                    source = parallel_code_stream(
                        params.input_files, fmt, state, n_threads=n_th)
                except (RuntimeError, OSError, ImportError):
                    source = None  # no native parser: serial fallback
            if source is None:
                source = file_code_stream(params.input_files, fmt, state,
                                          max_bytes=max_bytes)
        prev_last = -1
        for chunk in source:
            if params.homopolymer_compressed:
                chunk = homopolymer_compress_codes(chunk)
                # a run spanning the chunk boundary collapses to one code at
                # the head of this chunk; drop it if it continues prev run
                if len(chunk) and chunk[0] == prev_last:
                    chunk = chunk[1:]
                if len(chunk):
                    prev_last = int(chunk[-1])
            if feed_estimator:
                self._estimator.process_codes(chunk)
            yield chunk, state
        self._n_reads = state.n_reads

    def _kmc_db_chunks(self, params: Stage1Params, state):
        return kmc_db_code_chunks(params.input_files, state)

    def _run_stage0(self, params: Stage1Params):
        """Sampled signature histogram -> greedy signature->bin map."""
        t0 = time.perf_counter()
        k, m = params.kmer_len, params.signature_len
        s = params.batch_positions
        bs = BatchStream(s, k)
        msize = map_size(m)
        hist = np.zeros(msize, dtype=np.uint64)
        import jax.numpy as jnp

        from .ops.extract import stage0_stats_accum

        dev_hist = jnp.zeros((msize,), jnp.uint32)
        gen = (c for c, _ in self._chunks(params, max_bytes=defs.STATS_SAMPLE_BYTES))
        for batch in bs.batches(gen):
            packed, mask = pack_codes(batch)
            dev_hist = stage0_stats_accum(packed, mask, dev_hist, s=s, k=k, sig_len=m)
        hist += np.asarray(dev_hist, dtype=np.uint64)
        self._sig_map = build_signature_map(hist, m, params.n_bins)
        self._n_used_bins = int(self._sig_map.max()) + 1
        if params.verbose:
            print(f"[stage0] signature map: {time.perf_counter() - t0:.2f}s")

    def _run_stage1_bins(self, params: Stage1Params, results: Stage1Results):
        if params.device_store:
            self._run_stage1_device_store(params, results)
        else:
            self._run_stage1_host_buckets(params, results)

    def _run_stage1_device_store(self, params: Stage1Params, results: Stage1Results):
        """HBM-resident path: batch outputs never leave the device."""
        import jax

        from .ops.store import DeviceKmerStore

        k, m = params.kmer_len, params.signature_len
        s = params.batch_positions
        bs = BatchStream(s, k)
        # every sized pool derives from -m (memory.plan_memory — the
        # reference's AdjustMemoryLimits, kmc.h:427-507); an explicit
        # device_store_rows wins, strict-memory halves either way
        plan = self._memory_plan(params)
        capacity = max(plan.device_store_rows, 2 * s)
        # on real TPUs allocate full capacity upfront: HBM is plentiful and a
        # shape-stable store means each kernel compiles exactly once (growth
        # recompiles cost 30-90s each over the tunnel); on CPU (tests) start
        # small so the big sorts never materialize
        init_rows = capacity if jax.default_backend() != "cpu" else 2 * s
        store_kw = dict(
            k=k, sig_len=m, both_strands=params.canonical_kmers,
            map_mode=params.signature_map_policy,
        )
        from .ops.store import greedy_defer_default

        greedy_fold = (params.signature_map_policy == "greedy"
                       and greedy_defer_default())
        if params.signature_map_policy == "greedy" and not greedy_fold:
            # eager greedy needs the map upfront: the reference's sampled
            # stage-0 as a separate parse pass
            self._run_stage0(params)
            store_kw["sig_map"] = self._sig_map
            store_kw["n_bins"] = self._n_used_bins
        else:
            # prefix policy — or deferred greedy, where stage 0 FOLDS into
            # ingest: the sampled per-signature histogram (reference
            # CalcStats, splitter.cpp:439-533) is accumulated on device
            # from the first ingest batches' own buffers, and the map is
            # built right after ingest, before finalize.  No second parse
            # pass over the input.  (The sample boundary is
            # batch-granular in positions rather than a file-byte cap, so
            # the map can differ near the boundary from the eager path on
            # inputs larger than the sample — both are valid samples;
            # k-mer/count content is identical either way.)
            store_kw["n_bins"] = params.n_bins
            if greedy_fold:
                store_kw["sig_map"] = None
        store = DeviceKmerStore(
            capacity_rows=capacity,
            initial_rows=init_rows,
            spill_budget_bytes=plan.spill_budget_bytes,
            **store_kw,
        )
        total_bytes = sum(
            Path(p).stat().st_size for p in params.input_files if Path(p).exists()
        )
        ppo = params.percent_progress_observer
        if ppo is not None:
            ppo.set_label("Stage 1: ")
        state_ref = None
        t_host = t_queue = 0.0
        t_prev = time.perf_counter()
        chunk_gen = self._chunks(params)

        def gen():
            nonlocal state_ref
            for c, st in chunk_gen:
                state_ref = st
                yield c

        # producer/consumer split: the main thread parses+packs (native C,
        # GIL released) while a worker thread runs H2D + the ingest dispatch
        # (network-bound over the dev tunnel, also GIL-released) — on a
        # single host core the two genuinely interleave.  Each batch crosses
        # as ONE fused (packed ++ mask) buffer: per-transfer setup is
        # significant on the tunnel.
        import queue as _queue
        import threading

        import jax

        q: _queue.Queue = _queue.Queue(maxsize=3)
        errors: list = []

        import jax.numpy as jnp

        stage0_state = {"hist": None, "sampled": 0}
        if greedy_fold:
            stage0_state["hist"] = jnp.zeros((map_size(m),), jnp.uint32)
            import os as _os

            stage0_state["cap"] = int(_os.environ.get(
                "KMC_TPU_STAGE0_SAMPLE_POSITIONS", str(1 << 27)))

        def worker():
            try:
                while True:
                    item = q.get()
                    if item is None:
                        return
                    if item[0] == "b":
                        feed, args = "bounds", (
                            jax.device_put(item[1]), jnp.int32(item[2]))
                    else:
                        feed, args = "fused", (jax.device_put(item[1]),)
                    if (greedy_fold
                            and stage0_state["sampled"] < stage0_state["cap"]):
                        # the histogram batch rides the same device buffer
                        # the ingest is about to consume (ingest never
                        # donates its feed argument)
                        stage0_state["hist"] = store.stage0_accum(
                            feed, args, stage0_state["hist"], s=s)
                        stage0_state["sampled"] += s
                    if feed == "bounds":
                        store.ingest_boundaries(args[0], args[1], s=s)
                    else:
                        store.ingest_fused(args[0], s=s)
            except BaseException as e:  # noqa: BLE001 - reraised on join
                errors.append(e)
                while q.get() is not None:  # unblock the producer
                    pass

        th = threading.Thread(target=worker, name="kmc-ingest", daemon=True)
        th.start()
        try:
            for batch in bs.batches(gen()):
                # boundary-delta feed (0.28 B/code) when sentinels are
                # sparse; packed+mask (0.375 B/code) for degenerate batches
                buf, ts = pack_codes_boundaries(batch)
                item = ("b", buf, ts) if buf is not None else (
                    "m", pack_codes_fused(batch))
                t_now = time.perf_counter()
                t_host += t_now - t_prev
                if errors:
                    break
                q.put(item)
                if ppo is not None and total_bytes and state_ref is not None:
                    ppo.set_progress(
                        min(99, state_ref.consumed_bytes * 100 // total_bytes)
                    )
                t_prev = time.perf_counter()
                t_queue += t_prev - t_now
        finally:
            # always deliver the sentinel: a producer-side parse error must
            # not leave the worker (and the HBM store it closes over)
            # blocked on the queue forever
            q.put(None)
            th.join()
        if errors:
            raise errors[0]
        if ppo is not None:
            ppo.set_progress(100)
        if greedy_fold:
            t0 = time.perf_counter()
            hist = np.asarray(stage0_state["hist"], dtype=np.uint64)
            store.set_sig_map(build_signature_map(hist, m, params.n_bins))
            if params.verbose:
                print(f"[stage0] folded signature map "
                      f"({stage0_state['sampled']} sampled positions): "
                      f"{time.perf_counter() - t0:.2f}s")
        if params.verbose:
            print(f"[stage1] host(parse+pack): {t_host:.2f}s "
                  f"queue-wait: {t_queue:.2f}s "
                  f"({store.total_appended_rows // max(s,1)} batches)")
        self._store = store
        self._sig_map = store.host_sig_map()
        self._n_used_bins = store.n_used_bins
        results.n_total_super_kmers = store.total_super_kmers()

    def _run_stage1_host_buckets(self, params: Stage1Params, results: Stage1Results):
        k, m = params.kmer_len, params.signature_len
        s = params.batch_positions
        bs = BatchStream(s, k)
        n_bins = self._n_used_bins
        buckets = [[] for _ in range(n_bins)]
        bucket_rows = np.zeros(n_bins, dtype=np.int64)
        bucket_occ = np.zeros(n_bins, dtype=np.int64)
        sig_to_bin = self._sig_map.astype(np.int64)

        gen = (c for c, _ in self._chunks(params))
        for batch in bs.batches(gen):
            packed, mask = pack_codes(batch)
            u_sig, u_words, counts, n_groups = stage1_batch_packed(
                packed, mask, s=s, k=k, sig_len=m, both_strands=params.canonical_kmers
            )
            n = int(n_groups)
            sig = np.asarray(u_sig[:n])
            words = np.asarray(u_words[:n])
            cnts = np.asarray(counts[:n])
            keep = sig != INVALID_SIG
            if not keep.all():
                sig, words, cnts = sig[keep], words[keep], cnts[keep]
            bins = sig_to_bin[sig]
            order = np.argsort(bins, kind="stable")
            bins_sorted = bins[order]
            bounds = np.searchsorted(bins_sorted, np.arange(n_bins + 1))
            words = words[order]
            cnts = cnts[order]
            for b in range(n_bins):
                lo, hi = bounds[b], bounds[b + 1]
                if lo < hi:
                    buckets[b].append((words[lo:hi], cnts[lo:hi]))
                    bucket_rows[b] += hi - lo
                    bucket_occ[b] += int(cnts[lo:hi].sum(dtype=np.int64))
        self._buckets = buckets
        self._bucket_rows = bucket_rows
        self._bucket_occurrences = bucket_occ

    def _run_stage1_small_k(self, params: Stage1Params, results: Stage1Results):
        import jax.numpy as jnp

        k = params.kmer_len
        s = params.batch_positions
        bs = BatchStream(s, k)
        hist = jnp.zeros(smallk_histogram_shape(k), jnp.uint32)
        gen = (c for c, _ in self._chunks(params))
        for batch in bs.batches(gen):
            packed, mask = pack_codes(batch)
            hist = smallk_batch_packed(
                packed, mask, hist, s=s, k=k, both_strands=params.canonical_kmers
            )
        self._smallk_hist = np.asarray(hist)[:-1].astype(np.uint64)  # drop invalid slot

    # ---------------- checkpoint / resume ----------------
    # Stage-1 output is the natural checkpoint (SURVEY.md §5.4): persisting
    # the device store + signature map makes stage 2 restartable, the TPU
    # analogue of re-running from the reference's tmp bin files.
    def save_stage1_checkpoint(self, path: str):
        if self._store is None:
            raise RuntimeError("no stage-1 device store to checkpoint")
        self._store.save_checkpoint(path)
        np.savez(
            path + ".meta",
            sig_map=self._sig_map,
            n_used_bins=self._n_used_bins,
            n_reads=self._n_reads,
            kmer_len=self._s1.kmer_len,
            signature_len=self._s1.signature_len,
            canonical=self._s1.canonical_kmers,
        )

    def resume_stage1_checkpoint(self, path: str, params: Stage1Params):
        from .ops.store import DeviceKmerStore

        meta = np.load(path + ".meta.npz")
        params.kmer_len = int(meta["kmer_len"])
        params.signature_len = int(meta["signature_len"])
        params.canonical_kmers = bool(meta["canonical"])
        params.validate()
        self._s1 = params
        self._small_k = params.kmer_len <= 13
        self._n_reads = int(meta["n_reads"])
        self._store = DeviceKmerStore.load_checkpoint(
            path, capacity_rows=self._memory_plan(params).device_store_rows
        )
        self._sig_map = self._store.host_sig_map()
        self._n_used_bins = self._store.n_used_bins

    # ---------------- stage 2 ----------------
    def run_stage2(self, params: Stage2Params) -> Stage2Results:
        params.validate()
        if self._s1 is None:
            raise RuntimeError("run_stage1 first")
        t0 = time.perf_counter()
        results = Stage2Results()
        if self._s1.estimate_histogram_cfg == EstimateHistogramCfg.ONLY_ESTIMATE:
            return results  # kmc.h:1411-1412: stage 2 is a no-op when -e
        if self._small_k:
            self._run_stage2_small_k(params, results)
        else:
            self._run_stage2_bins(params, results)
        results.time = time.perf_counter() - t0
        return results

    def _run_stage2_bins(self, params: Stage2Params, results: Stage2Results):
        if self._s1.device_store:
            self._run_stage2_device_store(params, results)
        else:
            self._run_stage2_host_buckets(params, results)

    def _make_db_info(self, params: Stage2Params) -> DbInfo:
        s1 = self._s1
        k = s1.kmer_len
        if self._estimated_histogram:
            # estimated count of unique k-mers within cutoffs (kmc.h:1437-1446)
            hist = self._estimated_histogram
            end = min(params.cutoff_max + 1, len(hist))
            n_est_unique = sum(hist[params.cutoff_min : end])
        else:
            n_est_unique = 4 * self._n_reads  # reference heuristic kmc.h:1436
        lut_prefix_len = pick_lut_prefix_len(k, self._n_used_bins, n_est_unique)
        counter_size = calc_counter_size(params.cutoff_max, params.counter_max)
        return DbInfo(
            kmer_len=k,
            counter_size=counter_size,
            lut_prefix_len=lut_prefix_len,
            signature_len=s1.signature_len,
            cutoff_min=params.cutoff_min,
            cutoff_max=params.cutoff_max,
            both_strands=s1.canonical_kmers,
            n_bins=self._n_used_bins,
        )

    def _run_stage2_device_store(self, params: Stage2Params, results: Stage2Results):
        s1 = self._s1
        k = s1.kmer_len
        store = self._store
        n_total = store.total_occurrences()

        if params.without_output or params.output_file_type == OutputFileType.KFF:
            # KFF needs big-endian counters and whole k-mers: use the
            # words-based finalize
            bins, words, counts, (n_unique, n_below, n_above) = store.finalize(
                cutoff_min=params.cutoff_min,
                cutoff_max=params.cutoff_max,
                counter_max=params.counter_max,
            )
            results.time_finalize_exec = store.t_finalize_exec
            results.time_finalize_d2h = store.t_finalize_d2h
            if s1.verbose:
                print(f"[stage2] finalize exec: {store.t_finalize_exec:.2f}s "
                      f"D2H: {store.t_finalize_d2h:.2f}s ({len(bins)} rows)")
            self._store = None
            results.n_unique_kmers = n_unique
            results.n_below_cutoff_min = n_below
            results.n_above_cutoff_max = n_above
            results.n_total_kmers = n_total
            if params.without_output:
                return
            bounds = np.searchsorted(bins, np.arange(self._n_used_bins + 1))
            kmer_bytes = words_to_kmer_bytes(words, k)
            self._write_kff(params, kmer_bytes, counts, bounds)
            return

        # KMC2 output: device completer emits the exact on-disk payload
        info = self._make_db_info(params)
        rec, lut, (n_unique, n_below, n_above) = store.finalize_records(
            cutoff_min=params.cutoff_min,
            cutoff_max=params.cutoff_max,
            counter_max=params.counter_max,
            lut_prefix_len=info.lut_prefix_len,
            counter_size=info.counter_size,
        )
        results.time_finalize_exec = store.t_finalize_exec
        results.time_finalize_d2h = store.t_finalize_d2h
        if s1.verbose:
            print(f"[stage2] finalize exec: {store.t_finalize_exec:.2f}s "
                  f"D2H: {store.t_finalize_d2h:.2f}s ({len(rec)} rows)")
        self._store = None
        results.n_unique_kmers = n_unique
        results.n_below_cutoff_min = n_below
        results.n_above_cutoff_max = n_above
        results.n_total_kmers = n_total

        t0 = time.perf_counter()
        writer = Kmc2DbWriter(params.output_file_name, info, self._sig_map)
        writer.n_unique = n_unique
        writer.n_below_min = n_below
        writer.n_above_max = n_above
        writer.n_total = n_total
        writer.write_all_records(rec, lut)
        writer.close()
        if s1.verbose:
            print(f"[stage2] db write: {time.perf_counter() - t0:.2f}s")

    def _write_kff(self, params: Stage2Params, kmer_bytes, counts, bounds):
        """KFF output: one raw section per non-empty bin, mirroring the
        reference completer's KFF path (kb_completer.cpp:172-177)."""
        from .formats.kff import KffWriter

        s1 = self._s1
        counter_size = calc_counter_size(params.cutoff_max, params.counter_max)
        w = KffWriter(
            params.output_file_name + ".kff",
            canonical=s1.canonical_kmers,
            k=s1.kmer_len,
            counter_size=counter_size,
            min_count=params.cutoff_min,
            max_count=params.cutoff_max,
        )
        for b in range(self._n_used_bins):
            lo, hi = bounds[b], bounds[b + 1]
            if lo < hi:
                w.store_section(kmer_bytes[lo:hi], counts[lo:hi])
        w.close()

    def _run_stage2_host_buckets(self, params: Stage2Params, results: Stage2Results):
        s1 = self._s1
        k = s1.kmer_len
        W = (k + 15) // 16
        kb = (k + 3) // 4

        info = self._make_db_info(params)
        writer = None
        kff_writer = None
        if not params.without_output:
            if params.output_file_type == OutputFileType.KFF:
                from .formats.kff import KffWriter

                kff_writer = KffWriter(
                    params.output_file_name + ".kff",
                    canonical=s1.canonical_kmers,
                    k=k,
                    counter_size=info.counter_size,
                    min_count=params.cutoff_min,
                    max_count=params.cutoff_max,
                )
            else:
                writer = Kmc2DbWriter(params.output_file_name, info, self._sig_map)

        for b in range(self._n_used_bins):
            parts = self._buckets[b]
            total = int(self._bucket_rows[b])
            if total == 0:
                continue
            P = max(1024, 1 << (total - 1).bit_length())
            words = np.full((P, W), 0xFFFFFFFF, dtype=np.uint32)
            counts = np.zeros(P, dtype=np.uint32)
            pos = 0
            for w, c in parts:
                words[pos : pos + len(w)] = w
                counts[pos : pos + len(c)] = c
                pos += len(w)
            kept_words, kept_counts, n_kept, stats = merge_count_bin(
                words,
                counts,
                cutoff_min=params.cutoff_min,
                cutoff_max=params.cutoff_max,
                counter_max=params.counter_max,
            )
            n = int(n_kept)
            kw = np.asarray(kept_words[:n])
            kc = np.asarray(kept_counts[:n])
            n_unique, n_below, n_above = (int(x) for x in stats)
            results.n_unique_kmers += n_unique
            results.n_below_cutoff_min += n_below
            results.n_above_cutoff_max += n_above
            results.n_total_kmers += int(self._bucket_occurrences[b])
            if writer is not None:
                kmer_bytes = words_to_kmer_bytes(kw, k)
                writer.put_bin(
                    b,
                    kmer_bytes,
                    kc,
                    stats={
                        "n_unique": n_unique,
                        "n_below_min": n_below,
                        "n_above_max": n_above,
                        "n_total": int(self._bucket_occurrences[b]),
                    },
                )
            elif kff_writer is not None:
                kff_writer.store_section(words_to_kmer_bytes(kw, k), kc)
            self._buckets[b] = None  # free as we go
        if writer is not None:
            writer.close()
        if kff_writer is not None:
            kff_writer.close()

    def _run_stage2_small_k(self, params: Stage2Params, results: Stage2Results):
        s1 = self._s1
        stats = smallk_finalize_and_write(
            self._smallk_hist, s1.kmer_len,
            cutoff_min=params.cutoff_min, cutoff_max=params.cutoff_max,
            counter_max=params.counter_max, canonical=s1.canonical_kmers,
            output_file_name=params.output_file_name,
            output_kff=params.output_file_type == OutputFileType.KFF,
            write=not params.without_output)
        (results.n_unique_kmers, results.n_below_cutoff_min,
         results.n_above_cutoff_max, results.n_total_kmers) = stats


def kmc_db_code_chunks(paths, state):
    """-fkmc input: every k-mer stored in the database becomes one read
    (counters ignored), matching CBinaryFilesReader::ProcessKMC
    (binary_reader.h:238-305)."""
    from .formats.kmc_db import read_db

    for path in paths:
        db = read_db(path)
        kmers = db.kmers_bytes()
        k_in = db.info.kmer_len
        block = 1 << 16
        for lo in range(0, len(kmers), block):
            rows = kmers[lo : lo + block]
            n, kb = rows.shape
            codes = np.empty((n, kb * 4), np.uint8)
            codes[:, 0::4] = (rows >> 6) & 3
            codes[:, 1::4] = (rows >> 4) & 3
            codes[:, 2::4] = (rows >> 2) & 3
            codes[:, 3::4] = rows & 3
            out = np.full((n, k_in + 1), defs.CODE_INVALID, np.uint8)
            out[:, :k_in] = codes[:, kb * 4 - k_in :]
            state.n_reads += n
            yield out.reshape(-1)


def smallk_finalize_and_write(hist, k, *, cutoff_min, cutoff_max,
                              counter_max, canonical, output_file_name,
                              output_kff=False, write=True):
    """Shared small-k (k<=13) finalize: threshold the dense 4^k histogram
    and write a KMC1-format database (or one KFF section), mirroring the
    reference's CSmallKCompleter (kb_completer.h:92, kmc.h:677-970).
    Returns (n_unique, n_below, n_above, n_total).  Used by the
    single-chip Runner and the multi-chip distributed_count."""
    nonzero = np.flatnonzero(hist)
    cnts = hist[nonzero]
    n_unique = len(nonzero)
    n_total = int(cnts.sum())
    below = cnts < cutoff_min
    above = cnts > cutoff_max
    n_below = int(below.sum())
    n_above = int(above.sum())
    keep = ~below & ~above
    kmers_int = nonzero[keep].astype(np.uint64)
    counts = np.minimum(cnts[keep], counter_max).astype(np.uint32)

    counter_size = calc_counter_size(cutoff_max, counter_max)
    lut_prefix_len = pick_lut_prefix_len(k, 1, len(kmers_int), kmc1=True)
    if write:
        kb = (k + 3) // 4
        kmer_bytes = np.zeros((len(kmers_int), kb), dtype=np.uint8)
        v = kmers_int.copy()
        for j in range(kb - 1, -1, -1):
            kmer_bytes[:, j] = (v & np.uint64(0xFF)).astype(np.uint8)
            v >>= np.uint64(8)
        if output_kff:
            from .formats.kff import KffWriter

            w = KffWriter(
                output_file_name + ".kff",
                canonical=canonical,
                k=k,
                counter_size=counter_size,
                min_count=cutoff_min,
                max_count=cutoff_max,
            )
            w.store_section(kmer_bytes, counts)
            w.close()
        else:
            info = DbInfo(
                kmer_len=k,
                counter_size=counter_size,
                lut_prefix_len=lut_prefix_len,
                cutoff_min=cutoff_min,
                cutoff_max=cutoff_max,
                both_strands=canonical,
                version=0,
            )
            write_kmc1_db(output_file_name, info, kmer_bytes, counts)
    return n_unique, n_below, n_above, n_total


def words_to_kmer_bytes(words: np.ndarray, k: int) -> np.ndarray:
    """(N, W) uint32 MSW-first lanes -> (N, KB) right-aligned big-endian bytes."""
    n, W = words.shape
    kb = (k + 3) // 4
    b = np.ascontiguousarray(words).astype(">u4").view(np.uint8).reshape(n, 4 * W)
    return np.ascontiguousarray(b[:, 4 * W - kb :])


def count(
    input_files,
    output_file_name: str,
    k: int = defs.DEFAULT_K,
    **kwargs,
):
    """One-call convenience API: returns (Stage1Results, Stage2Results)."""
    s1_keys = set(Stage1Params.__dataclass_fields__)
    s2_keys = set(Stage2Params.__dataclass_fields__)
    p1 = Stage1Params(input_files=list(input_files), kmer_len=k)
    p2 = Stage2Params(output_file_name=output_file_name)
    for key, value in kwargs.items():
        if key in s1_keys:
            setattr(p1, key, value)
        elif key in s2_keys:
            setattr(p2, key, value)
        else:
            raise TypeError(f"unknown parameter {key}")
    r = Runner()
    res1 = r.run_stage1(p1)
    res2 = r.run_stage2(p2)
    return res1, res2
