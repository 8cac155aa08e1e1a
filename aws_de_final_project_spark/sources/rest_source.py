"""Incremental REST ingest — Spark-native version of the reference's
ingest Lambda (``Additional_Data_Function/get_data_api.py:6-26``).

Reference behavior reproduced:

* high-water-mark predicate pushed to the server: the Lambda asks the
  Socrata SoQL endpoint for rows with ``updated_on > yesterday``
  (``get_data_api.py:10-13``) — the filter never reaches the cluster
  (operator P9/S1);
* empty-response guard: bodies <= 250 chars (header-only) are not
  written (``get_data_api.py:16``, S2);
* raw CSV landed per-run with a dated name (``get_data_api.py:18-24``,
  S3).

Spark-native upgrades: the high-water-mark is persisted state (the
Lambda recomputed "yesterday", which double-fetches on reruns and
skips on outages — a real correctness gap), and the landing zone is
the input dir of the checkpointed streaming ingest
(streaming/ingest.py), which replaces job bookmarks.

``fetcher`` is injected so tests (and offline runs) never need the
network; the default uses ``requests`` only if available.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from datetime import datetime, timedelta, timezone

EMPTY_BODY_THRESHOLD = 250  # get_data_api.py:16


def default_fetcher(url: str) -> str:
    """HTTP GET -> response text. Import-gated: this container has no
    network; inject a fetcher in tests."""
    try:
        import requests  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "requests not available; inject fetcher=... instead"
        ) from e
    return requests.get(url, timeout=180).text  # Lambda timeout parity


def _load_hwm(state_path: str, default: str) -> str:
    if os.path.exists(state_path):
        with open(state_path) as f:
            return json.load(f)["high_water_mark"]
    return default


def _save_hwm(state_path: str, hwm: str) -> None:
    os.makedirs(os.path.dirname(state_path), exist_ok=True)
    with open(state_path, "w") as f:
        json.dump({"high_water_mark": hwm}, f)


def ingest_increment(
    base_url: str,
    landing_dir: str,
    state_path: str,
    fetcher: Callable[[str], str] = default_fetcher,
    now: datetime | None = None,
    hwm_column: str = "updated_on",
) -> str | None:
    """One incremental pull. Returns the landed file path, or None if
    the response was empty (guard S2).

    URL shape mirrors ``get_data_api.py:13``: a SoQL ``$where`` on the
    update timestamp, evaluated server-side.
    """
    now = now or datetime.now(timezone.utc)
    default_hwm = (now - timedelta(days=1)).strftime("%Y-%m-%dT%H:%M:%S")
    hwm = _load_hwm(state_path, default_hwm)
    url = f'{base_url}?$where={hwm_column} > "{hwm}"'
    body = fetcher(url)
    if len(body) <= EMPTY_BODY_THRESHOLD:
        return None
    os.makedirs(landing_dir, exist_ok=True)
    out = os.path.join(
        landing_dir, f"recent_source_data_{now.strftime('%Y%m%d%H%M%S')}.csv"
    )
    with open(out, "w") as f:
        f.write(body)
    _save_hwm(state_path, now.strftime("%Y-%m-%dT%H:%M:%S"))
    return out
