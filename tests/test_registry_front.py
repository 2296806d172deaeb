"""Pins for the driver-window rotation contract (VERDICT r8 #1/#3).

The driver's correctness harness samples the first 50 registry entries
each round; round 8 shipped new queries BEHIND an unrotated front, so
they earned no driver rows.  These pins make that failure mode loud:

* the registry must actually lead with ``_DRIVER_FRONT`` (rotation ran
  and nothing re-ordered it afterwards);
* the front is exactly the driver's window size (50);
* COVERAGE.md's documented registry count matches ``len(REGISTRY)`` so
  the audit doc can't silently drift (round 8 said 228 while the
  registry held 240).
"""

import re
import os

from presto_spark.queries import REGISTRY
from presto_spark.queries import _DRIVER_FRONT

DRIVER_WINDOW = 50
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_front_is_window_sized():
    assert len(_DRIVER_FRONT) == DRIVER_WINDOW
    assert len(set(_DRIVER_FRONT)) == DRIVER_WINDOW, "duplicate front entries"


def test_registry_leads_with_front():
    assert list(REGISTRY)[:DRIVER_WINDOW] == _DRIVER_FRONT


def test_coverage_doc_registry_count_matches():
    path = os.path.join(REPO_ROOT, "COVERAGE.md")
    with open(path, encoding="utf-8") as f:
        text = f.read()
    m = re.search(r"(\d+) registry\s+queries total", text)
    assert m, "COVERAGE.md must state '<N> registry queries total'"
    assert int(m.group(1)) == len(REGISTRY), (
        f"COVERAGE.md says {m.group(1)} registry queries; "
        f"REGISTRY has {len(REGISTRY)} — update the doc"
    )
