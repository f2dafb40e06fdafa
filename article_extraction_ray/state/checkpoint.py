"""Iteration checkpointing — crash-resume for iterative fits.

The flagship write is resumable at the PARTITION level
(state/lineage.py); iterative algorithms (k-means sweeps, PageRank,
label propagation, BPE merge rounds) need resume at the ITERATION
level: a 40-sweep fit over a 100 TB table that dies at sweep 37 must
not restart at sweep 0.

``iterate_with_checkpoint`` wraps any ``state = step(state, i)`` loop:
after each step the state (numpy arrays / plain picklables) is written
atomically (tmp + rename, same discipline as the lineage manifests),
and a fresh run resumes from the highest complete iteration.  State
files are small by construction — iterative fits keep model state
(centroids, rank vectors, merge tables) driver-side and broadcast per
sweep, so the checkpoint is KBs-to-MBs regardless of corpus size.
"""

from __future__ import annotations

import os
import pickle
import re
from pathlib import Path
from typing import Any, Callable

_CKPT_RE = re.compile(r"^iter-(\d+)\.pkl$")


def latest_checkpoint(ckpt_dir: str | Path) -> tuple[int, Any] | None:
    """(iteration, state) of the highest complete checkpoint, or None."""
    d = Path(ckpt_dir)
    if not d.is_dir():
        return None
    best = -1
    for f in os.listdir(d):
        m = _CKPT_RE.match(f)
        if m:
            best = max(best, int(m.group(1)))
    if best < 0:
        return None
    with open(d / f"iter-{best}.pkl", "rb") as fh:
        return best, pickle.load(fh)


def save_checkpoint(ckpt_dir: str | Path, iteration: int, state: Any) -> None:
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"iter-{iteration}.pkl"
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(state, fh)
    os.replace(tmp, path)


def iterate_with_checkpoint(
    state: Any,
    step: Callable[[Any, int], Any],
    n_iters: int,
    *,
    ckpt_dir: str | Path | None = None,
    should_stop: Callable[[Any, Any], bool] | None = None,
    keep_last: int = 2,
) -> Any:
    """Run ``state = step(state, i)`` for ``i in range(n_iters)`` with
    optional per-iteration checkpoints.

    With ``ckpt_dir``, resumes after the highest complete iteration
    found there (step 37's crash re-runs only sweeps 38+), keeps the
    newest ``keep_last`` checkpoint files, and stops early when
    ``should_stop(prev_state, new_state)`` returns True (the
    convergence test — also honored on the resumed path)."""
    start = 0
    if ckpt_dir is not None:
        found = latest_checkpoint(ckpt_dir)
        if found is not None:
            start = found[0] + 1
            state = found[1]
    for i in range(start, n_iters):
        prev = state
        state = step(state, i)
        if ckpt_dir is not None:
            save_checkpoint(ckpt_dir, i, state)
            d = Path(ckpt_dir)
            iters = sorted(
                int(_CKPT_RE.match(f).group(1)) for f in os.listdir(d) if _CKPT_RE.match(f)
            )
            for old in iters[:-keep_last]:
                (d / f"iter-{old}.pkl").unlink(missing_ok=True)
        if should_stop is not None and should_stop(prev, state):
            break
    return state
