"""Pin the past-window board: run the FULL registry oracle matrix + the
physical-plan scale lint locally and write ``LOCAL_CORRECTNESS_r{N}.json``.

The external driver oracle-checks only the first 50 registry slots
(CORRECTNESS_r{N}.json); every query past the window is only covered by
pytest, which leaves no committed round-over-round artifact a reviewer can
diff. This script produces exactly that artifact for the FULL registry, in
the same row shape as the driver's file (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err), plus ``lint`` (scale-lint
verdict), ``floor_ok`` (QuerySpec.min_rows non-degeneracy floor), and a
trailing ``__summary__`` entry.

Usage::

    python scripts/local_correctness.py <round> [sf_dir] [suffix]

    # the fast tier (a few minutes), run per round:
    python scripts/local_correctness.py 6 /root/testdata/sf0.001 _sf001
    # the driver's tier — slower, catches sf0.001-degenerate queries:
    python scripts/local_correctness.py 6 /root/testdata/sf0.01 _sf01

``suffix`` lands in the artifact name
(``LOCAL_CORRECTNESS_r{N}{suffix}.json``) so both tiers can be committed
side by side.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_to_postgres_spark.plans import REGISTRY  # noqa: E402
from pandas_to_postgres_spark.plans.lint import lint_plan  # noqa: E402
from pandas_to_postgres_spark.session import get_spark  # noqa: E402

#: queries allowed to carry error-severity lint findings (mirrors
#: tests/test_correctness.py::_LINT_ALLOW — the X5 UDTF slot IS the
#: designated row-Python table-function tier).
LINT_ALLOW = {
    "udtf_sentences": ("python_udf",),
}


def _git_head() -> str:
    import subprocess

    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:  # noqa: BLE001 — the stamp is advisory
        return "unknown"


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: local_correctness.py <round> [sf_dir]")
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    suffix = sys.argv[3] if len(sys.argv) > 3 else ""

    from tests.oracle_harness import compare, duck_con  # noqa: PLC0415

    spark = get_spark("local-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    out: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    t_start = time.perf_counter()
    for name in REGISTRY:  # registry order == driver order
        spec = REGISTRY[name]
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "lint": None,
            "floor_ok": None,
        }
        try:
            df = spec.fn(spark, sf_dir)
            got = df.toPandas()
            row["spark_rows"] = int(len(got))
            # non-degeneracy floor (QuerySpec.min_rows, valid from
            # sf0.001 up): an empty-but-hash-matching result is a FAIL
            row["floor_ok"] = len(got) >= spec.min_rows
            findings = [
                f"{f.severity}:{f.code}"
                for f in lint_plan(df)
                if f.severity == "error"
                and f.code not in LINT_ALLOW.get(name, ())
            ]
            row["lint"] = "ok" if not findings else ";".join(findings)
            if spec.oracle is None:
                row["err"] = "no_oracle"
                if row["floor_ok"]:
                    n_rows_only += 1
                else:
                    n_fail += 1
                    row["err"] = (
                        f"floor: {len(got)} rows < min_rows {spec.min_rows}"
                    )
            else:
                want = con.sql(spec.oracle).df()
                row["oracle_rows"] = int(len(want))
                diag = compare(got, want)
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = diag is None or not str(diag).startswith(
                    "columns"
                )
                row["hash_match"] = diag is None
                if diag is None and row["lint"] == "ok" and row["floor_ok"]:
                    n_pass += 1
                else:
                    n_fail += 1
                    if diag is not None:
                        row["err"] = str(diag)[:300]
                    elif not row["floor_ok"]:
                        row["err"] = (
                            f"floor: {len(got)} rows < min_rows {spec.min_rows}"
                        )
        except Exception as e:  # noqa: BLE001 — record, don't abort the board
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            n_fail += 1
        out[name] = row
        status = (
            "rows-only"
            if row["err"] == "no_oracle"
            else (
                "PASS"
                if row["hash_match"] and row["lint"] == "ok" and row["floor_ok"]
                else "FAIL"
            )
        )
        print(f"{name:40s} {status}", file=sys.stderr)

    out["__summary__"] = {
        "round": rnd,
        "sf_dir": sf_dir,
        "n_queries": len(REGISTRY),
        "n_oracle_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": n_rows_only,
        "wall_sec": round(time.perf_counter() - t_start, 1),
        # session-commit stamp (round-8 verdict ask #7): lets a reviewer
        # diff this board against the driver's CORRECTNESS_r{N}.json for
        # the same tree mechanically — scripts/board_diff.py is that diff
        "commit": _git_head(),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"LOCAL_CORRECTNESS_r{rnd:02d}{suffix}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["__summary__"]))


if __name__ == "__main__":
    main()
