"""Assemble a SCALEPROBE_*.json artifact from a driver_sim log.

Usage:
    python scripts/scaleprobe_artifact.py <log> <out.json> [key=value ...]

Parses the ``[OK] name: N rows match (S s)`` / ``[FAIL] name: ...`` lines
driver_sim prints and records rows + seconds per query plus the failure
list; extra ``key=value`` args land as top-level metadata (round, copies,
src, notes...).
"""

from __future__ import annotations

import json
import re
import sys


def parse(log_text: str) -> dict:
    results: dict[str, dict] = {}
    failures: list[str] = []
    for m in re.finditer(
        r"\[OK\]\s+(\S+): (\d+) rows match \(([\d.]+)s\)", log_text
    ):
        results[m.group(1)] = {
            "rows": int(m.group(2)),
            "sec": float(m.group(3)),
        }
    for m in re.finditer(r"\[FAIL\]\s+(\S+?):", log_text):
        if m.group(1) not in failures:
            failures.append(m.group(1))
    return {"results": dict(sorted(results.items())), "failures": failures}


def main() -> int:
    log_path, out_path = sys.argv[1], sys.argv[2]
    meta: dict = {}
    for kv in sys.argv[3:]:
        k, _, v = kv.partition("=")
        try:
            meta[k] = json.loads(v)
        except ValueError:
            meta[k] = v
    with open(log_path, errors="replace") as f:
        parsed = parse(f.read())
    body = {**meta, "queries": len(parsed["results"]) + len(parsed["failures"]), **parsed}
    with open(out_path, "w") as f:
        json.dump(body, f, indent=1)
        f.write("\n")
    print(f"{len(parsed['results'])} ok, {len(parsed['failures'])} failed -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
