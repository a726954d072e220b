"""Pipeline configuration.

The reference exposes its whole tuning surface through
``deduplicate_graphs(...)`` keyword args (reference ``dedup_pipeline.py:11-22``:
``alpha, threshold, top_k, filter_literals``) plus per-script constants
(``Run_TransE.py:36-49``). The new engine collects the analogous knobs — and
the LSH/signature parameters the reference does not have — into one frozen
dataclass whose hash doubles as the checkpoint-compatibility key.

Numeric semantics lifted from the reference:

* ``adaptive_thresholds`` — evidence-count → pass threshold map,
  reference ``similarity_utils.py:49-54``.
* ``acronym_boost`` = 0.95 — reference ``similarity_utils.py:42-47``.
* tier cut-offs ``near_exact``/``similar`` = 0.9/0.7 —
  reference ``output_utils.py:60-66``.
* ``alpha`` score blend, ``threshold``, ``top_k`` —
  reference ``Run_TransE.py:36-49``, ``similarity_utils.py:22-33``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


def _default_adaptive() -> dict[int, float]:
    return {1: 0.4, 2: 0.55, 3: 0.7, 4: 0.8, 5: 0.85}


@dataclass(frozen=True)
class PipelineConfig:
    # -- determinism ---------------------------------------------------------
    seed: int = 42

    # -- signature stage (Signer actor pool) ---------------------------------
    shingle_k: int = 5          # character shingle width over caption_norm
    num_perm: int = 128         # MinHash permutations K
    bands: int = 16             # LSH bands b (b * rows == num_perm)
    rows: int = 8               # rows per band r — r=8 keeps the S-curve
                                # steep: j=0.85 dup pairs collide w.p. ~0.99,
                                # j=0.35 template-share pairs w.p. ~0.3%
    shingle_values_only: bool = True
                                # shingle the parsed field VALUES, not the
                                # verbalized labels: the reference compares
                                # per-predicate literal values
                                # (similarity_utils.py:58-104), and template
                                # labels otherwise put a ~0.6 Jaccard floor
                                # under every DISTINCT record pair
    phash_bands: int = 2        # image pHash split into 32-bit LSH chunks:
                                # catches identical/Hamming≤1 images; deeper
                                # re-encodes are caught by the caption
                                # families (their captions are unchanged)
    simhash_bands: int = 2      # caption SimHash 32-bit chunks — the
                                # near-identical-caption backstop
    block_fields: tuple[str, ...] = ("name", "email")
                                # reference-style blocking keys (B1 analog,
                                # reference dedup_pipeline.py:26-31): exact
                                # hash of these parsed caption fields joins
                                # the candidate-key families — catches
                                # substring/omission dups whose remaining
                                # fields are intact

    # -- candidate stage -----------------------------------------------------
    max_bucket: int = 64        # LSH bucket size above which hot-bucket
                                # refinement (salting) kicks in
    max_refined: int = 64       # cap on representatives after refinement

    # -- verification --------------------------------------------------------
    alpha: float = 0.5          # caption-score vs image-score blend (A2)
    threshold: float = 0.5      # global floor on fused score
    top_k: int = 5              # per-right-entity candidate cap (A1), match mode
    filter_literals: bool = True  # reference F5 quirk: keep failing pairs
                                  # only when evidence count < 3
    adaptive_thresholds: dict[int, float] = field(default_factory=_default_adaptive)
    adaptive_default: float = 0.85
    acronym_boost: float = 0.95
    near_exact: float = 0.9
    similar: float = 0.7

    # -- execution -----------------------------------------------------------
    batch_size: int = 4096      # rows per batch for text-only stages
    image_batch_size: int = 256 # rows per batch when `bytes` is carried
    signer_concurrency: int = 8 # actor-pool size for the Signer stage
    driver_uf_max_edges: int = 2_000_000  # below this, union-find runs on the
                                          # driver; above, distributed rounds

    def __post_init__(self) -> None:
        if self.bands * self.rows != self.num_perm:
            raise ValueError(
                f"bands*rows must equal num_perm "
                f"({self.bands}*{self.rows} != {self.num_perm})"
            )

    def config_hash(self) -> str:
        """Stable hash of every semantic knob — the checkpoint lineage key.

        Execution-only knobs (batch sizes, concurrency) are excluded so a
        resume at a different parallelism level reuses the same checkpoints
        (BASELINE.md: manifests stay valid across parallelism levels).
        """
        d = asdict(self)
        for k in ("batch_size", "image_batch_size", "signer_concurrency",
                  "driver_uf_max_edges"):
            d.pop(k)
        d["adaptive_thresholds"] = sorted(d["adaptive_thresholds"].items())
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


def media_pool_size(cap: int = 64, floor: int = 4) -> tuple[int, int]:
    """Autoscaling actor-pool bounds for media decode/embed stages, sized to
    the CLUSTER rather than a hard-coded constant: ``(1, min(cap, CPUs))``.
    A fixed ``(1, 8)`` cap left 24+ cores idle on a 32-CPU node (measured
    2× on image_embed_near_dup_pairs); on a 256-node cluster it would idle
    everything but one node's worth of actors. Autoscaling pools only spawn
    actors when backlogged and release idle ones, so a generous upper bound
    costs nothing on small inputs. ``cap`` bounds per-STAGE actor count so
    several concurrent media stages cannot oversubscribe a node pool."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", floor)) if (
            ray.is_initialized()
        ) else floor
    except Exception:
        cpus = floor
    return (1, max(floor, min(cap, cpus)))
