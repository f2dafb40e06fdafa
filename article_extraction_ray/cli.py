"""Job entrypoint for ``ray job submit`` (the north rule's launch shape):

    ray job submit --working-dir . -- \
        python -m article_extraction_ray extract \
            --corpus /data/corpus.lance --out /data/extracted \
            --mode hybrid --partitions 512

Subcommands:

- ``extract`` — the flagship interleaved-document extraction pipeline,
  resumable partitioned write (re-submitting after a crash skips
  finished partitions via the lineage manifests).
- ``compact`` — rewrite a directory of small parquet files into
  ~target-size files (see state/compact.py).

This module is the ONE library-adjacent place allowed to call
``ray.init`` (guarded): on a cluster, ``ray job submit`` provides the
address via RAY_ADDRESS and init attaches to it; standalone it starts
local Ray.  The driver contract (__ray_entry__.py) and the library
never init Ray themselves.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)


def cmd_extract(args) -> dict:
    _ensure_ray()
    from .pipelines.flagship import run_flagship

    summary = run_flagship(
        args.corpus,
        args.out,
        mode=args.mode,
        num_partitions=args.partitions,
    )
    return summary


def cmd_compact(args) -> dict:
    _ensure_ray()
    from .state.compact import compact_parquet

    return compact_parquet(
        args.in_dir, args.out_dir, target_bytes=args.target_mb * 1024 * 1024
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="article_extraction_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="flagship extraction pipeline")
    ex.add_argument("--corpus", required=True, help=".lance or parquet corpus path")
    ex.add_argument("--out", required=True, help="partitioned parquet output dir")
    ex.add_argument("--mode", default="hybrid", choices=["hybrid", "fused", "shuffled"])
    ex.add_argument("--partitions", type=int, default=64)
    ex.set_defaults(fn=cmd_extract)

    co = sub.add_parser("compact", help="compact small parquet files")
    co.add_argument("--in-dir", required=True)
    co.add_argument("--out-dir", required=True)
    co.add_argument("--target-mb", type=int, default=256)
    co.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    summary = args.fn(args)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
