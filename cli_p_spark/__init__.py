"""cli_p_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of the reference (ps-auxw/CLI-P: CLIP embeddings
stored in LMDB + faiss IVF inner-product top-k search) as a distributed,
DataFrame-first Spark pipeline:

    ingest interleaved text+media documents
      -> span explode (order-preserving)
      -> vectorized pseudo-CLIP encoding (Arrow pandas UDFs)
      -> entity linking (broadcast exact top-k / LSH-bucketed ANN join)
      -> canonicalization (connected components over high-sim mention pairs)
      -> (subj, pred, obj) triple materialization into partitioned tables
      -> per-partition lineage + checkpoint/resume

See SURVEY.md for the reference-to-Spark mapping, with file:line citations.
"""

__version__ = "0.1.0"
