"""Z-order layout: Morton math, row preservation, 2-D pruning payoff."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestMorton:
    def test_interleave_known_values(self):
        from article_extraction_ray.sources.zorder import morton2

        # z(1,0)=2 (x in the high lane), z(0,1)=1, z(1,1)=3, z(2,2)=12
        x = np.array([1, 0, 1, 2], dtype=np.uint64)
        y = np.array([0, 1, 1, 2], dtype=np.uint64)
        assert morton2(x, y).tolist() == [2, 1, 3, 12]

    def test_locality_monotone_blocks(self):
        from article_extraction_ray.sources.zorder import morton2

        # all cells of one 2x2-aligned quadrant sort before any cell of
        # the next quadrant — the property pruning relies on
        z00 = morton2(np.array([0, 1, 0, 1], dtype=np.uint64), np.array([0, 0, 1, 1], dtype=np.uint64))
        z11 = morton2(np.array([2, 3, 2, 3], dtype=np.uint64), np.array([2, 2, 3, 3], dtype=np.uint64))
        assert z00.max() < z11.min()


class TestZorderLayout:
    @pytest.fixture()
    def grid_df(self):
        rng = np.random.default_rng(9)
        n = 20_000
        return pd.DataFrame(
            {
                "row_id": np.arange(n),
                "x": rng.uniform(0, 100, n),
                "y": rng.uniform(0, 100, n),
            }
        )

    def test_rows_preserved_and_pruning_pays(self, ray_session, tmp_path, grid_df):
        import pyarrow.parquet as pq
        import ray.data as rd

        from article_extraction_ray.sources.zorder import prune_files, write_zordered

        ds = rd.from_pandas(grid_df).repartition(8)
        summary = write_zordered(ds, tmp_path / "z", "x", "y", num_files=32)
        assert summary["rows"] == len(grid_df)
        assert summary["files"] >= 8

        got = pq.read_table(tmp_path / "z").to_pandas()
        assert sorted(got["row_id"].tolist()) == grid_df["row_id"].tolist()

        # a 30%x30% box (inside one top-level z-quadrant — a box
        # straddling the 50% line spans all four quadrants and loses
        # the curve's contiguity): z-order touches ~f^2 of the space,
        # a single-column sort can only prune on x (~f of the files)
        z_files = prune_files(tmp_path / "z", "x", "y", (10, 40), (10, 40))
        n_z = summary["files"]
        assert len(z_files) < n_z / 2, (len(z_files), n_z)

        # ...whereas the same box over an x-SORTED layout reads every
        # file that matches x, i.e. y prunes nothing (control)
        xs = grid_df.sort_values("x").reset_index(drop=True)
        xdir = tmp_path / "xsort"
        xdir.mkdir()
        per = len(xs) // 32
        for i in range(32):
            pq.write_table(
                pa.Table.from_pandas(xs.iloc[i * per : (i + 1) * per], preserve_index=False),
                xdir / f"x-{i:05d}.parquet",
            )
        x_files = prune_files(xdir, "x", "y", (10, 40), (10, 40))
        assert len(z_files) < len(x_files), (len(z_files), len(x_files))

        # pruning is sound: every row in the box lives in a kept file
        import os

        kept = pq.read_table([str(tmp_path / "z" / f) for f in z_files]).to_pandas()
        box = grid_df[(grid_df.x.between(10, 40)) & (grid_df.y.between(10, 40))]
        assert set(box["row_id"]).issubset(set(kept["row_id"]))
