"""Certification-rotation audit.

The driver's correctness gate certifies only the FIRST 50 entries of
``__spark_entry__.queries()`` per round (observed: CORRECTNESS_r01 and
_r02 each equal exactly the head-50 of the registry at their commits).
``CERTIFIED.json`` records, per round, which queries got a fully-green
driver row.  These tests pin the rotation policy:

* every registry entry is either already driver-certified in some round,
  sits inside the current head-50 window (i.e. will be certified next
  driver run), or — ONLY when the window is already fully packed with
  never-certified queries — overflows just past it as the staged head of
  the next rotation. Nothing AVOIDABLY falls out of certification: the
  overflow exemption dies the moment any certified query occupies a
  window slot an uncertified one needs;
* the head of the window is packed with never-certified queries first —
  no certified query occupies a slot a never-certified one needs;
* the manifest only names real registry queries (no stale entries).
"""
import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50  # driver certifies this many head entries per round


def _manifest():
    return json.loads((REPO / "CERTIFIED.json").read_text())


def _certified():
    m = _manifest()
    out = set()
    for names in m["rounds"].values():
        out.update(names)
    return out


def test_every_query_certified_or_in_window():
    order = list(entry.queries())
    certified = _certified()
    uncovered = [
        q for i, q in enumerate(order) if q not in certified and i >= WINDOW
    ]
    window_fully_uncertified = all(
        q not in certified for q in order[:WINDOW]
    )
    # Overflow past the window is legitimate ONLY while the window itself
    # is maximally used (every slot certifying something new this round)
    # AND the overflow queries sit contiguously right after it — staged
    # as the head of the next rotation, not scattered.
    if uncovered and window_fully_uncertified:
        staged = [
            q for q in order[WINDOW:] if q not in certified
        ]
        expected_prefix = order[WINDOW : WINDOW + len(staged)]
        assert staged == expected_prefix, (
            f"uncertified overflow queries must sit contiguously right "
            f"after the head-{WINDOW} window (staged for next rotation); "
            f"found scattered: {staged}"
        )
        return
    assert uncovered == [], (
        f"{len(uncovered)} queries are outside the driver's head-{WINDOW} "
        f"window and have never been driver-certified: {uncovered}. "
        "Rotate queries() so they occupy the head, or record their green "
        "round in CERTIFIED.json."
    )


def test_window_head_prefers_uncertified():
    """Inside the head-50, all never-certified queries come before any
    certified one — the window is not wasted re-certifying."""
    order = list(entry.queries())[:WINDOW]
    certified = _certified()
    seen_certified = False
    for q in order:
        if q in certified:
            seen_certified = True
        else:
            assert not seen_certified, (
                f"never-certified query {q!r} sits after a certified one "
                f"inside the head-{WINDOW}; pack uncertified queries first"
            )


def test_manifest_names_are_real_queries():
    registry = set(entry.queries())
    for rnd, names in _manifest()["rounds"].items():
        stale = sorted(set(names) - registry)
        assert stale == [], f"CERTIFIED.json {rnd} names unknown queries: {stale}"


def test_manifest_rounds_match_correctness_files():
    """Each manifest round must equal the fully-green rows of its
    CORRECTNESS_r{N}.json (when the file is present)."""
    for rnd, names in _manifest()["rounds"].items():
        path = REPO / f"CORRECTNESS_{rnd}.json"
        if not path.exists():
            continue
        rows = json.loads(path.read_text())
        green = sorted(
            k
            for k, v in rows.items()
            if v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match")
            and not v.get("err")
        )
        assert sorted(names) == green, f"CERTIFIED.json {rnd} drifted from {path.name}"
