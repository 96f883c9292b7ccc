"""Engine-wide constants.

Mirrors the reference's in-code constants (dim=512 at
/root/reference/build-index.py:77,81; nlist=100 / nprobe=32 at
build-index.py:81, query-index.py:30; k=50 at query-index.py:35) but makes
them configurable.  Tests use DIM=64 to match the driver-provided
``embeddings`` table; the real-encoder deployment flips DIM to 512.
"""

from __future__ import annotations

from dataclasses import dataclass

SEED = 42

# Embedding dimension. Reference: 512 (CLIP ViT-B/32). Tests: 64.
DIM = 64

# Zero-norm guard threshold, verbatim from /root/reference/query-index.py:14-16.
NORM_EPS = 1e-9

# Linking: emit a triple only if cosine(mention, entity) >= TAU.
# The reference emits unthresholded ranked lists (query-index.py:114-119);
# the KG pipeline thresholds rank-1 links so junk spans produce no edge.
TAU = 0.40

# Default top-k, reference REPL default c=50 (query-index.py:35).
DEFAULT_K = 50

# Canonicalization: mention-mention similarity cutoff for CC edges.
TAU_CC = 0.90

# LSH: random-hyperplane signatures.  n_bands x n_bits per band; a candidate
# pair must collide in >=1 band.  Plays the role of the reference's IVF
# nlist/nprobe recall knob (build-index.py:81, query-index.py:30,48-54).
LSH_BANDS = 8
LSH_BITS = 8
# Multi-probe width: how many Hamming-1 bit flips to probe per band on the
# query side (0 = exact-signature buckets only).  ~ reference nprobe.
LSH_PROBES = 2


@dataclass(frozen=True)
class PipelineConfig:
    dim: int = DIM
    seed: int = SEED
    tau: float = TAU
    tau_cc: float = TAU_CC
    k: int = 1  # rank-1 linking for triples; DEFAULT_K for search API
    lsh_bands: int = LSH_BANDS
    lsh_bits: int = LSH_BITS
    lsh_probes: int = LSH_PROBES
    # explicit repartition width before the embedding stage (north_rule)
    embed_partitions: int = 32
