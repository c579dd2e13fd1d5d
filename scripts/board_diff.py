"""One-command board diff (round-8 verdict ask #7): mechanically compare
the driver's ``CORRECTNESS_r{N}.json`` against a committed
``LOCAL_CORRECTNESS_r{N}*.json`` board — same row shape, so agreement is
checkable field-by-field for every query both artifacts ran.

Usage::

    python scripts/board_diff.py CORRECTNESS_r09.json LOCAL_CORRECTNESS_r09_sf01.json

Exit status 0 = every common query agrees on (rows_match, schema_match,
hash_match, spark_rows, rows-only-ness); 1 = disagreements (printed).
Queries only in one artifact are listed informationally (the driver checks
the 50-slot window; the local board covers the full registry).
"""

from __future__ import annotations

import json
import sys

#: fields that must agree for a common query (err text is free-form and
#: lint/floor_ok are local-board extras, so neither is compared)
FIELDS = ("rows_match", "schema_match", "hash_match", "spark_rows")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    with open(sys.argv[1]) as f:
        a = json.load(f)
    with open(sys.argv[2]) as f:
        b = json.load(f)
    a.pop("__summary__", None)
    summary_b = b.pop("__summary__", {})
    common = sorted(set(a) & set(b))
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    bad = []
    for name in common:
        ra, rb = a[name], b[name]
        diffs = [
            f"{f}: {ra.get(f)!r} vs {rb.get(f)!r}"
            for f in FIELDS
            if ra.get(f) != rb.get(f)
        ]
        rows_only_a = ra.get("err") == "no_oracle"
        rows_only_b = rb.get("err") == "no_oracle"
        if rows_only_a != rows_only_b:
            diffs.append(f"rows-only: {rows_only_a} vs {rows_only_b}")
        if diffs:
            bad.append((name, diffs))
    print(f"common queries: {len(common)}  agree: {len(common) - len(bad)}")
    if summary_b.get("commit"):
        print(f"local board commit: {summary_b['commit']}")
    if only_a:
        print(f"only in {sys.argv[1]} ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(
            f"only in {sys.argv[2]} ({len(only_b)}): past-window registry "
            "rows (expected)"
        )
    for name, diffs in bad:
        print(f"DISAGREE {name}: " + "; ".join(diffs))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
