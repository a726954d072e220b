"""entity_deduplication_hack_main_ray — a Ray-Data-native near-duplicate
detection + clustering engine.

Built from scratch (NOT a port) with the query/data-processing capabilities of
the reference repo ``Timszy/entity-deduplication-hack-main`` (see SURVEY.md),
re-expressed as idiomatic Ray Data pipelines:

* ``ray.data.Dataset`` end to end; ``map_batches`` over zero-copy Arrow
  batches for every per-record transform.
* Stateful stages (image decode + pHash + MinHash signature computation)
  are actor pools: callable classes with one-time setup in ``__init__``.
* The single wide step — LSH band bucketing — is ONE ``groupby`` shuffle
  with explicit hot-bucket handling (signature-refinement + star pairs).
* Clustering is a distributed hash-to-min label propagation (union-find
  semantics) with a driver-side fallback for provably-small edge sets.
* Every stage writes partitioned Parquet + a manifest → resumable runs.

Determinism: every hash family (shingle rolling hash, MinHash permutations,
SimHash, pHash, band hashing, salting) derives from the single
``PipelineConfig.seed`` so reruns are bit-identical — this is what makes the
recall-vs-oracle acceptance test (BASELINE.md) meaningful, mirroring the
reference's seeding discipline (reference ``embedding_utils.py:83,93``).
"""

from .config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
