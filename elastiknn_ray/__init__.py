"""elastiknn_ray — a Ray-Data-native near-duplicate detection & clustering engine.

A from-scratch reimplementation of the query/data-processing capabilities of
alexklibisz/elastiknn (an Elasticsearch exact/LSH nearest-neighbor plugin) as
idiomatic Ray Data pipelines: every kernel is a vectorized Arrow/NumPy batch
transform run through ``Dataset.map_batches``; stateful stages (LSH parameter
holders, suffix-array builders) are actor pools; wide steps (band grouping,
pair dedup, verification joins, union-find rounds) are ``groupby``/``join``
shuffles with explicit skew handling.

Reference semantics (file:line pointers refer to /root/reference):
  - MinHash banding  — elastiknn-models/.../JaccardLshModel.java:27-63
  - Bit-sampling LSH — elastiknn-models/.../HammingLshModel.java:31-127
  - Hyperplane LSH   — elastiknn-models/.../CosineLshModel.java:26-51
  - Stable-dist LSH  — elastiknn-models/.../L2LshModel.java:39-134
  - Exact sims       — elastiknn-models/.../ExactModel.java:10-38
"""

__version__ = "0.1.0"

from elastiknn_ray.models.facade import ElastiknnModel  # noqa: F401
from elastiknn_ray.config import (  # noqa: F401
    CosineLshConfig,
    DedupConfig,
    HammingLshConfig,
    JaccardLshConfig,
    L2LshConfig,
    PermutationLshConfig,
    ShingleConfig,
)
