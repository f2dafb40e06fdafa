"""CLI entrypoint: extract + compact subcommands end-to-end in subprocesses."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])


def _run(args: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "article_extraction_ray", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_extract_then_resubmit_resumes(tmp_path):
    from article_extraction_ray.sources.synth import ensure_corpus_parquet

    corpus = ensure_corpus_parquet("/tmp/ae_corpora", 2000, 42)
    out_dir = str(tmp_path / "out")
    s1 = _run(["extract", "--corpus", corpus, "--out", out_dir, "--partitions", "8"])
    assert s1["partitions_written"] == 8 and s1["rows"] > 0
    s2 = _run(["extract", "--corpus", corpus, "--out", out_dir, "--partitions", "8"])
    assert s2["partitions_written"] == 0 and s2["partitions_skipped"] == 8


def test_compact(tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    for i in range(5):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"x": np.arange(i * 10, (i + 1) * 10)}), preserve_index=False
            ),
            src / f"f{i}.parquet",
        )
    s = _run(["compact", "--in-dir", str(src), "--out-dir", str(tmp_path / "dst"), "--target-mb", "64"])
    assert s["rows"] == 50 and s["files_out"] <= s["files_in"]
