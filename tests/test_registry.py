"""Registry-level invariants the evaluation driver depends on:
window ordering (the driver records CORRECTNESS rows for the FIRST 50
``queries()`` entries), full oracle coverage, and the machine-readable
window file staying in sync with the code."""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    import importlib
    import sys

    sys.path.insert(0, REPO)
    import __ray_entry__ as e

    return importlib.reload(e)


def test_window_is_the_registry_prefix():
    e = _entry()
    names = list(e.queries().keys())
    assert names[:50] == e._R5_WINDOW
    assert len(set(names)) == len(names)


def test_every_query_has_an_oracle():
    e = _entry()
    q, o = set(e.queries()), set(e.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_window_file_in_sync():
    e = _entry()
    with open(os.path.join(REPO, "scripts", "window_r05.json")) as f:
        w = json.load(f)
    names = list(e.queries().keys())
    assert w["window"] == e._R5_WINDOW
    assert w["registered_total"] == len(names)
    # deferred list = registered minus (previously checked + window)
    prev = set(w["cumulative_checked_before"])
    expect = sorted(n for n in names
                    if n not in prev and n not in set(e._R5_WINDOW))
    assert w["never_checked_after_expected"] == expect
