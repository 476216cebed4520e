"""The decisive recall check on driver data: the LSH pipeline's cluster
assignments must EQUAL the exhaustive exact-pair path's clusters (same tau,
same shingles) — approximate candidate generation may only lose pairs, and at
the operating point (1-(1-0.5^3)^64 ≈ 0.9998 per threshold pair) it should
lose none on these tables."""

import pandas as pd
import pytest


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_lsh_clusters_equal_exact_clusters(ray_session, sf_dir):
    from elastiknn_ray.pipelines.queries import q_dup_clusters_exact, q_lsh_clusters

    exact = (
        q_dup_clusters_exact(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lsh = (
        q_lsh_clusters(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(lsh, exact)
