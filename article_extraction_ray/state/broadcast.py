"""Broadcast small-side lookups (reference J1/J3/J4/J5 pattern).

The reference loads dimension tables (hardware/country, ~100s of rows)
into driver memory and scans them per row
(/root/reference/tables/paper_information_table.py:85-103).  The
Ray-native equivalent ships the small side to the object store ONCE with
``ray.put`` and resolves it inside each task/actor via ``ray.get`` (a
zero-copy read on the same node) — never re-serialized per batch, never
a distributed shuffle join.
"""

from __future__ import annotations

from typing import Any


class Broadcast:
    """Wrapper around a ``ray.put`` handle usable from map_batches closures.

    Lazily resolves (and caches) the object once per worker process.
    Falls back to holding the raw value when Ray is not initialized
    (plain unit tests).
    """

    def __init__(self, value: Any):
        import ray

        if ray.is_initialized():
            self._ref = ray.put(value)
            self._value = None
        else:
            self._ref = None
            self._value = value

    def get(self) -> Any:
        if self._ref is not None and self._value is None:
            import ray

            self._value = ray.get(self._ref)
        return self._value

    def key(self) -> str:
        """Stable identity for per-worker stage caches (the object-store
        ref hex; falls back to the value's id in Ray-less unit tests)."""
        return self._ref.hex() if self._ref is not None else f"local-{id(self._value)}"

    def __getstate__(self):
        # never ship the resolved value inside pickled closures — only the
        # object-store ref travels; workers re-resolve locally (zero-copy).
        state = self.__dict__.copy()
        if state.get("_ref") is not None:
            state["_value"] = None
        return state
