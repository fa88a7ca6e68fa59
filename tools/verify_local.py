"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, then compares row count, column names,
and an order-insensitive value hash (floats canonicalized).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from dbt_core_gcloud_template_spark.session import get_spark
from dbt_core_gcloud_template_spark.sources.registry import TABLES


def canon(v) -> str:
    """Canonicalize a cell for hashing.

    Deliberately STRICTER than round 1: Decimals are stringified verbatim
    (scale-preserving) rather than coerced to float — the driver's gate
    hashed raw Decimal outputs differently across the Spark and DuckDB
    clients, so any query whose local pass depends on loose Decimal
    handling must be flagged here.  Queries should emit DOUBLE/BIGINT/
    VARCHAR/DATE/TIMESTAMP in their final projection, never raw DECIMAL.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"DEC:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def _persist_times(sf_dir: str, times: dict[str, float]) -> None:
    """Append this FULL run's per-query Spark wall times to
    VERIFY_TIMES.json (r9 verdict #7): a second, driver-box-independent
    timing series future rounds can diff per query and cross-check
    against the bench protocol's calibration probes.  Keyed by UTC
    timestamp + sf, newest last, last 8 full runs kept (partial runs
    never persist — a missing query would read as a regression)."""
    import json
    import os
    from datetime import datetime, timezone

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "VERIFY_TIMES.json")
    try:
        with open(path) as f:
            hist = json.load(f)
    except (FileNotFoundError, ValueError):
        hist = {"sessions": []}
    # regression canary: before appending, diff this run against the
    # most recent prior session at the SAME sf_dir and print queries
    # slower by >1.5x AND >0.5s absolute (both thresholds, so tiny
    # sub-second queries and global box drift don't spam).  Advisory
    # output only — the bench protocol's calibration probes decide
    # whether a mover is box load or code.
    prior = next(
        (
            s for s in reversed(hist["sessions"])
            if s.get("sf_dir") == sf_dir
        ),
        None,
    )
    if prior is not None:
        movers = []
        for q, t in sorted(times.items()):
            t0 = prior["times_sec"].get(q)
            # `is not None`, not truthiness: a prior time that rounded
            # to 0.000 must still flag a regression (ratio prints inf)
            if t0 is not None and t > 1.5 * t0 and t - t0 > 0.5:
                ratio = f"{t / t0:.2f}x" if t0 > 0 else "new/inf"
                movers.append(f"{q} {t0:.2f}s -> {t:.2f}s ({ratio})")
        if movers:
            print(
                f"TIMING movers vs {prior['ts']} "
                f"(>1.5x and >0.5s; advisory; series is a ROLLING "
                f"window of the last 8 sessions, not full history — "
                f"per-query medians across the window are the stable "
                f"reference):"
            )
            for m in movers:
                print(f"  {m}")
    hist["sessions"].append(
        {
            "ts": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
            "sf_dir": sf_dir,
            "times_sec": {k: round(v, 3) for k, v in sorted(times.items())},
        }
    )
    hist["sessions"] = hist["sessions"][-8:]
    # atomic publish: a crash mid-write must not truncate the file —
    # the next run's parse error would silently reset the whole series
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(hist, f, indent=1)
    os.replace(tmp, path)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    ran = 0
    spark_times: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        spark_times[name] = spark_t
        if name not in oracles:
            print(f"PASS {name}: rows={len(srows)} (no oracle — rows-only) [{spark_t:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c for c in res.columns]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sn, sh = frame_digest(scols, srows)
        on, oh = frame_digest(ocols, orows)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures.append(name)
        elif sn != on:
            print(f"FAIL {name}: rowcount spark={sn} oracle={on}")
            failures.append(name)
        elif sh != oh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            # show a few differing lines for debugging
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("|".join(canon(r[i]) for i in order) for r in srows)
            oset = sorted("|".join(canon(r[i]) for i in order) for r in orows)
            sdiff = [l for l in sset if l not in set(oset)][:3]
            odiff = [l for l in oset if l not in set(sset)][:3]
            print(f"  cols: {[scols[i] for i in order]}")
            for l in sdiff:
                print(f"  spark-only: {l}")
            for l in odiff:
                print(f"  oracle-only: {l}")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={sn} hash={sh} [{spark_t:.1f}s]")
    print(f"\n{ran - len(failures)}/{ran} pass ({len(qs)} registered)")
    if not only and not failures and ran == len(qs):
        _persist_times(sf_dir, spark_times)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
