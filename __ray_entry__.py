"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then ``entry()`` as a smoke check, runs
each ``queries()[name](sf_dir)`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB.  Neither this module nor any
library code calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: MinHash-LSH near-dup detection + clustering over
    the sf0.001 documents table; returns the (doc_id, cluster_id) Dataset."""
    from elastiknn_ray.pipelines.queries import q_lsh_clusters

    return q_lsh_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from elastiknn_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from elastiknn_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
