"""Global constants for kmc_tpu.

Mirrors the tunable/compile-time knobs of the reference implementation
(/root/reference/kmc_core/defs.h) where they are semantically meaningful for a
TPU-native engine.  Values that only exist to tune the reference's CPU
pipeline (buffer widths, SIMD thresholds, ...) are intentionally absent.
"""

KMC_TPU_VER = "0.1.0"

# k-mer length limits (reference: defs.h:44-48)
MIN_K = 1
MAX_K = 256

# signature (minimizer) length limits (reference: defs.h:56-58)
MIN_SL = 5
MAX_SL = 11

# number of signature bins (reference: defs.h:41-42)
MIN_N_BINS = 64
MAX_N_BINS = 2000
DEFAULT_N_BINS = 512

# defaults mirrored from KMC::Stage1Params / Stage2Params
# (reference: kmc_core/kmc_runner.h:111-127,181-193)
DEFAULT_K = 25
DEFAULT_SIGNATURE_LEN = 9
DEFAULT_CUTOFF_MIN = 2
DEFAULT_CUTOFF_MAX = 1_000_000_000
DEFAULT_COUNTER_MAX = 255

# number of bytes of input sampled for the stage-0 signature statistics
# (reference: defs.h:37 STATS_FASTQ_SIZE)
STATS_SAMPLE_BYTES = 1 << 28

# code values: A=0 C=1 G=2 T=3; anything else (incl. N and read separators)
# is CODE_INVALID and breaks k-mers.
CODE_INVALID = 4


def byte_log(x: int) -> int:
    """Number of bytes needed to represent x (reference: defs.h:121-123)."""
    if x < (1 << 8):
        return 1
    if x < (1 << 16):
        return 2
    if x < (1 << 24):
        return 3
    if x < (1 << 32):
        return 4
    if x < (1 << 40):
        return 5
    if x < (1 << 48):
        return 6
    if x < (1 << 56):
        return 7
    return 8


def calc_counter_size(cutoff_max: int, counter_max: int) -> int:
    """Counter byte width stored in the DB (reference: defs.h:154-166).

    counter_max == 1 means "existence only": no counter bytes are stored.
    """
    if counter_max == 1:
        return 0
    return min(byte_log(cutoff_max), byte_log(counter_max))


def kmer_words_u32(k: int) -> int:
    """Number of 16-base uint32 lanes holding a k-mer on device."""
    return (k + 15) // 16


def kmer_bytes(k: int) -> int:
    """Number of bytes of the right-aligned big-endian k-mer representation."""
    return (k + 3) // 4
