"""Cross-session persistence for the renderer's adaptive-bucket hints.

The renderer sizes its sort/gather/scan domains with grow-only buckets
(render/pipeline.py _pairs_bucket & co). Every bucket growth is a fresh
XLA compile of the frame program — 40-200 s over the dev harness tunnel —
so a cold session that climbs the ladder from the seed factors pays
minutes of compiles before reaching steady state. Persisting the session
demand maxima (renderer.bucket_hints()) and seeding the next session with
them (renderer.set_bucket_hints()) lands the FIRST frame on the converged
buckets: one compile per program.

The store is a small JSON dict keyed by a caller-chosen config string
(resolution + scene tag). Stale entries only cost padding (hints are
demand counts, merged as floors), never correctness.
"""

from __future__ import annotations

import json
import os


def default_path() -> str:
    """GSWT_HINTS_PATH env override, else .gswt_hints.json at the repo/
    install root (two levels above this package dir)."""
    return os.environ.get(
        "GSWT_HINTS_PATH",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".gswt_hints.json",
        ),
    )


def load(key: str, path: str | None = None) -> dict | None:
    try:
        with open(path or default_path()) as f:
            h = json.load(f).get(key)
        return h if isinstance(h, dict) else None
    except Exception:
        return None


def save(key: str, hints: dict, path: str | None = None) -> bool:
    """Merge-write {key: hints}. Advisory: failures are swallowed (a
    read-only install just skips persistence)."""
    path = path or default_path()
    try:
        try:
            with open(path) as f:
                all_h = json.load(f)
        except Exception:
            all_h = {}
        all_h[key] = hints
        with open(path, "w") as f:
            json.dump(all_h, f, indent=1, sort_keys=True)
        return True
    except Exception:
        return False
