import time, sys
from kmc_tpu.runner import count
fq = "/tmp/kmc_tpu_bench/reads_8388608_30.fastq"
tuned = dict(batch_positions=1 << 23, device_store_rows=1 << 28, verbose=True)
t0 = time.perf_counter()
r1, r2 = count([fq], "/tmp/kmc_tpu_bench/probe_p", k=27, cutoff_min=2, **tuned)
t_p = time.perf_counter() - t0
print(f"PREFIX wall={t_p:.2f}s st1={r1.time:.2f} st2={r2.time:.2f} fexec={r2.time_finalize_exec:.2f} fd2h={r2.time_finalize_d2h:.2f}", flush=True)
t0 = time.perf_counter()
g1, g2 = count([fq], "/tmp/kmc_tpu_bench/probe_g", k=27, cutoff_min=2,
               signature_map_policy="greedy", **tuned)
t_g = time.perf_counter() - t0
print(f"GREEDY wall={t_g:.2f}s st1={g1.time:.2f} st2={g2.time:.2f} fexec={g2.time_finalize_exec:.2f} fd2h={g2.time_finalize_d2h:.2f}", flush=True)
print(f"ratio greedy/prefix = {t_p/t_g:.3f}")
