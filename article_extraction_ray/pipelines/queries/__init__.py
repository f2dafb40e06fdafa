"""Query registry: 339 pipelines + their DuckDB oracle SQL.

Formerly one 24.5-kLoC ``queries.py``; now split by family into
``part*.py`` files that the loop below executes IN ORDER into THIS
module's namespace.  The parts share one global dict — helpers,
constants and late-bound cross-references behave exactly as they did in
the single file (and ``monkeypatch.setattr`` on this module still
patches what the query functions see).  The part files are not
importable on their own (guarded); edit them directly, smaller diffs
and fewer merge conflicts are the point.  ``QUERIES`` / ``ORACLE_SQL``
are assembled in the final part.
"""

_ASSEMBLING = True

import pathlib as _pathlib

for _part in sorted(_pathlib.Path(__file__).parent.glob("part*.py")):
    exec(compile(_part.read_text(), str(_part), "exec"), globals())

del _ASSEMBLING, _part, _pathlib
