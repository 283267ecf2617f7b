"""Index hyper-parameters.

Defaults mirror the reference's ``DiskAnnParams`` and constants
(reference src/lib.rs:54-60, 87-107): max_degree=64, build_beam_width=128,
alpha=1.2, passes=1, extra_seeds=1.

Two engine-specific additions the reference does not need:

- ``seed``: the reference uses ``thread_rng`` (lib.rs:744, 991, 1046) and is
  therefore non-reproducible; a distributed engine must be deterministic, so
  every random draw derives from this explicit seed.
- ``num_shards``: the Spark unit of build/search parallelism (reference
  README.md:157's documented shard-and-merge recipe). Each shard holds an
  independent Vamana graph sized to fit one executor's memory:
  ~ n_shard * (4*dim + 4*max_degree) bytes (README.md:139). At 100 TB,
  pick num_shards so that bound stays under a few GiB per task.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SUPPORTED_METRICS = ("l2", "cosine", "dot", "hamming")

# reference lib.rs:62-65: reverse lists may grow to 1.3x max_degree before
# an amortized re-prune.
GRAPH_SLACK_FACTOR = 1.3
# reference lib.rs:83: nodes are (re)inserted in micro-batches of 256.
MICRO_BATCH_CHUNK_SIZE = 256
# reference lib.rs:742-744: medoid is estimated against 8 sampled pivots.
MEDOID_SAMPLE_K = 8


@dataclass(frozen=True)
class IndexParams:
    """Build/search hyper-parameters (reference lib.rs:54-60, 97-107)."""

    max_degree: int = 64
    build_beam_width: int = 128
    alpha: float = 1.2
    passes: int = 1
    extra_seeds: int = 1
    metric: str = "l2"
    seed: int = 42
    num_shards: int = 1
    # "hash": uniform id-hash shards — every shard samples the whole space;
    #   searches must scan all shards (README.md:157 equivalence).
    # "kmeans": locality shards around seeded k-means centroids — enables
    #   IVF-style shard routing (search_with_dists(shard_probes=p)) where
    #   only the p nearest shards are scanned.
    shard_by: str = "hash"
    # number of beam-search entry points per shard (farthest-point sampled
    # at build, medoid first). The reference enters at the medoid only
    # (lib.rs:648); extra entries are an engine robustness extension —
    # on strongly clustered shards a single entry point strands the search
    # in the medoid's cluster. 1 = exact reference behavior.
    entry_points: int = 8
    # merged-index build (DiskANN paper §4, "Indexing larger datasets"):
    # assign every point to its `shard_overlap` nearest k-means centroids,
    # build an independent Vamana graph per overlapped shard in parallel,
    # then UNION each point's out-edges across its shards into ONE global
    # graph. Search runs a single beam search per query on the merged
    # graph instead of one per shard — resolving the shard-count tension
    # of README.md:157's shard-and-merge (every query pays k' per shard).
    # Merged degree bound is shard_overlap * max_degree (the paper keeps
    # the union; occlusion pruning already happened per shard).
    merge_shards: bool = False
    shard_overlap: int = 2

    def __post_init__(self) -> None:
        if self.metric not in SUPPORTED_METRICS:
            raise ValueError(
                f"unsupported metric {self.metric!r}; expected one of {SUPPORTED_METRICS}"
            )
        if self.max_degree < 1:
            raise ValueError("max_degree must be >= 1")
        if self.build_beam_width < 1:
            raise ValueError("build_beam_width must be >= 1")
        if self.alpha < 1.0:
            raise ValueError("alpha must be >= 1.0")
        if self.passes < 1:
            raise ValueError("passes must be >= 1")
        if self.num_shards < 1:
            raise ValueError("num_shards must be >= 1")
        if self.shard_by not in ("hash", "kmeans"):
            raise ValueError("shard_by must be 'hash' or 'kmeans'")
        if self.shard_overlap < 1:
            raise ValueError("shard_overlap must be >= 1")
        if self.merge_shards and self.metric == "hamming":
            raise ValueError(
                "merge_shards requires a float metric (kmeans assignment)"
            )

    @property
    def slack_limit(self) -> int:
        """Degree bound before amortized re-prune (reference lib.rs:1008)."""
        import math

        return math.ceil(GRAPH_SLACK_FACTOR * self.max_degree)
