"""Unit-level equivalences for query scale-path routers."""

from __future__ import annotations

import pandas as pd


def test_bigram_sharded_matches_broadcast(ray_session):
    """Forcing the sharded (co-partitioned join) path produces the same
    per-doc scores as the broadcast path."""
    from article_extraction_ray.pipelines.queries import q_bigram_lm_score

    sf = "/root/testdata/sf0.001"
    bc = q_bigram_lm_score(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    sh = (
        q_bigram_lm_score(sf, broadcast_budget_rows=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, sh[bc.columns], check_dtype=False)
