#!/usr/bin/env python3
"""Execute every dialect-generated SQL statement against DuckDB.

The FakeJdbc unit tests validate statement STRUCTURE reflectively; this
check hands the same statements to a real SQL engine — the DuckDB the
oracle harness already uses — so a malformed quote, misplaced paren, or
bad clause order fails loudly.

Usage:
    sbt "runMain graft.etl.DialectDump /tmp/dialect_sql.json"
    python3 tools/check_dialect_sql.py /tmp/dialect_sql.json

Statements run in dump order (DDL first), with `?` parameters bound to
type-appropriate dummies, inside one in-memory database per dialect —
execution, not just parsing. Statements DuckDB's grammar genuinely lacks
(MERGE before DuckDB 1.4, Postgres ON CONFLICT against a unique INDEX
rather than a constraint) are tried anyway and only downgraded to
`SKIP known-unsupported` when the error is the documented engine gap;
any other error is a failure.
"""
import datetime
import json
import sys

import duckdb

DUMMY = datetime.datetime(2024, 1, 1, 0, 0, 0)

# (dialect, name) -> substring DuckDB reports for a documented engine gap.
# Anything else that errors is a real defect in the generated SQL.
KNOWN_GAPS = {
    ("ansi_merge", "upsert_report"): "MERGE",
    ("ansi_merge", "upsert_invalid"): "MERGE",
    # DuckDB anchors ON CONFLICT on PK/UNIQUE CONSTRAINT, not on a unique
    # index; Postgres (the dialect's target) accepts the index. The
    # statement still parses — accept only this exact semantic complaint.
    ("postgres", "upsert_invalid"): "conflict target",
}


def params_for(entry):
    """Type-aware dummies: TIMESTAMP columns get datetimes, counts get ints,
    text gets strings — positions mirror the dumped column orders."""
    n = entry["params"]
    name = entry["name"]
    if name in ("archive_range", "delete_range", "verify_ranged"):
        return [DUMMY, DUMMY]
    if name in ("insert_report", "upsert_report"):
        return [DUMMY, 1, 2, DUMMY]
    if name == "upsert_invalid":
        return [DUMMY, 1, 2, DUMMY, "err", "file.csv"]
    return [None] * n


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dialect_sql.json"
    entries = json.load(open(path))
    by_dialect = {}
    for e in entries:
        by_dialect.setdefault(e["dialect"], []).append(e)

    failures = []
    for dialect, stmts in by_dialect.items():
        conn = duckdb.connect(":memory:")
        for e in stmts:
            label = f"{dialect}/{e['name']}"
            try:
                conn.execute(e["sql"], params_for(e))
                print(f"PASS {label}")
            except Exception as ex:
                gap = KNOWN_GAPS.get((dialect, e["name"]))
                if gap and gap.lower() in str(ex).lower():
                    print(f"SKIP {label} (known engine gap: {gap})")
                else:
                    failures.append((label, str(ex).splitlines()[0]))
                    print(f"FAIL {label}: {str(ex).splitlines()[0]}")
        conn.close()

    total = sum(len(v) for v in by_dialect.values())
    print(f"== {total - len(failures)} ok, {len(failures)} fail, {total} total")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
