"""bench.py's driver-visible stdout line: always valid JSON, always
under the capture-window budget, for any warm-map size (the r4/r5
blackout was this line outgrowing the driver's ~2000-char tail
capture; ADVICE r6 found the trim loop could NameError on tiny maps
and overflow when it exhausted)."""

from __future__ import annotations

import json

import bench


def _check(warm):
    line = bench.final_line(warm, round(sum(warm.values()), 3), 0.1)
    assert len(line) <= bench.LINE_BUDGET, len(line)
    payload = json.loads(line)
    assert payload["unit"] == "sec"
    assert payload["queries_omitted"] == len(warm) - len(payload["queries"])
    return payload


def test_empty_and_tiny_maps():
    assert _check({})["queries"] == {}
    assert _check({"q1": 1.234})["queries"] == {"q1": 1.234}


def test_typical_map_keeps_slowest():
    warm = {f"query_name_{i:03d}": round(0.1 * i, 3) for i in range(90)}
    payload = _check(warm)
    kept = payload["queries"]
    assert kept  # something survived
    # kept entries are the most expensive ones
    dropped = set(warm) - set(kept)
    if dropped and kept:
        assert min(kept.values()) >= max(warm[n] for n in dropped)


def test_pathologically_long_names_never_overflow():
    warm = {("x" * 400) + str(i): float(i) for i in range(10)}
    payload = _check(warm)
    # even if every named entry is too wide, the empty map is emitted
    assert isinstance(payload["queries"], dict)
