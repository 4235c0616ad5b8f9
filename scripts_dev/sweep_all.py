"""Full-surface driver replica: run EVERY registered query through the
strict oracle compare (tests/oracle_check.py::compare — the driver's
hash semantics) and write a committed JSON artifact with per-query
status + wall time, so the "N/N green" claim is reproducible in one
command (VERDICT r4 "Next round" item 6).

Usage:
    python scripts_dev/sweep_all.py [--sf-dir DIR] [--out FILE] [name ...]

Defaults: sf0.01 (the driver's correctness SF), artifact written to
scripts_dev/sweep_r<ROUND>.json if --out not given (ROUND from
$SWEEP_ROUND, default "5"). Imports __spark_entry__ by path exactly
like the driver does, so registry wiring is exercised too.

Oracle-digest cache (r9 verdict #8 — the r9 sf10 gate was a 3.3-hour
session, ~dominated by DuckDB recomputing heavy oracle SQL): for
digest-capable queries the DuckDB half (count + md5-chunk sums) is
DETERMINISTIC in (oracle SQL, result schema, input files), so it is
cached in $SWEEP_ORACLE_CACHE (default
scripts_dev/oracle_digest_cache.json) keyed by
sha256(name | sf fingerprint | oracle SQL | column canonicalization).
The ENGINE side always runs fresh — the cache only skips re-running
the oracle's own SQL when neither it nor the data changed (an edited
oracle or regenerated dataset changes the key and misses). Strict
(sub-threshold) compares are never cached: the driver's gate collects
both sides, and at small row counts the oracle re-run is cheap.
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _sf_fingerprint(sf_dir: str) -> str:
    """Input-data identity for the cache key: per-table size plus a
    cheap content hash (sha256 over the first+last 64 KiB — parquet
    footers carry row-group stats, so any regeneration perturbs the
    tail even at identical size; ADVICE r10 #3). Content-based rather
    than mtime-based on purpose: /tmp datasets are rebuilt
    deterministically across sessions, and a byte-identical rebuild
    should HIT the banked digests, while any real regeneration misses."""
    from tests.oracle_check import TABLES

    parts = []
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            size = os.path.getsize(p)
            h = hashlib.sha256()
            with open(p, "rb") as fh:
                h.update(fh.read(65536))
                if size > 65536:
                    fh.seek(max(65536, size - 65536))
                    h.update(fh.read(65536))
            parts.append(f"{t}:{size}:{h.hexdigest()[:16]}")
        except OSError:
            parts.append(f"{t}:0")
    return ";".join(parts)


def _sf_fingerprint_legacy(sf_dir: str) -> str:
    """The pre-r11 sizes-only fingerprint — kept ONLY so banked digests
    keyed under it migrate to the content-hash key on first hit (the
    sf10 bank is hours of oracle compute; a key-schema change must not
    cold-start it)."""
    from tests.oracle_check import TABLES

    parts = []
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        parts.append(f"{t}:{os.path.getsize(p) if os.path.exists(p) else 0}")
    return ";".join(parts)


def _cache_key(name: str, sf_fp: str, sql: str, fields: dict) -> str:
    canon = ";".join(f"{c}:{fields[c].simpleString()}" for c in sorted(fields))
    blob = "\x1f".join(["digest-v1", name, sf_fp, sql, canon])
    return hashlib.sha256(blob.encode()).hexdigest()[:32]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    out = None
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--out":
            out = next(it)
        else:
            names.append(a)
    if out is None:
        out = str(
            REPO / "scripts_dev" / f"sweep_r{os.environ.get('SWEEP_ROUND', '5')}.json"
        )

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from tests.oracle_check import (
        compare,
        digest_compare,
        digest_unsupported,
        duck_digest,
        duck_strict,
        duckdb_conn,
        spark_digest,
        spark_strict,
    )

    # oracle results above this row count are value-gated via the
    # engine-side digest instead of the collect-everything strict path.
    # Default lowered 4M -> 1M in r8: the strict path's cost is the
    # Py4J collect + Python tuple sort, which made the 1-4M-row jl
    # dims the sf10 sweep's worst scalers (jl_dim_company_checked
    # 2.5 s -> 170 s, exponent 1.84, almost all compare overhead);
    # every query still gets a strict pass at the SF where its result
    # is under the threshold — the scale-evidence contract.
    digest_rows = int(os.environ.get("SWEEP_DIGEST_ROWS", "1000000"))
    from end_to_end_data_engineering_job_listings_etl_spark.session import get_spark

    spark = get_spark(app_name="sweep-all", cpus=int(os.environ.get("SWEEP_CPUS", "16")))
    con = duckdb_conn(sf_dir)
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = names or list(qs)

    cache_path = Path(
        os.environ.get(
            "SWEEP_ORACLE_CACHE", str(REPO / "scripts_dev" / "oracle_digest_cache.json")
        )
    )
    try:
        cache: dict[str, dict] = json.loads(cache_path.read_text())
    except (OSError, json.JSONDecodeError):
        cache = {}
    sf_fp = _sf_fingerprint(sf_dir)
    sf_fp_old = _sf_fingerprint_legacy(sf_dir)
    n_cache_hits = 0

    def _flush_cache() -> None:
        try:
            cache_path.write_text(json.dumps(cache, indent=0) + "\n")
        except OSError:
            pass

    def _cache_lookup(key: str, legacy_key: str) -> dict | None:
        """Content-hash key first; on miss, migrate a sizes-only-keyed
        bank entry (pre-r11) to the new key. Migration can only HIT for
        data that also matches on sizes — exactly the old guarantee —
        and after one warm pass every entry carries the content key."""
        ent = cache.get(key)
        if ent is None and legacy_key in cache:
            ent = cache.pop(legacy_key)
            cache[key] = ent
            # No per-hit flush: rewriting the ~11k-line bank once per
            # migrated entry made the first warm pass over a pre-r11
            # bank O(entries) full-file writes (ADVICE r11). The
            # existing flush points after fresh computes — and the
            # final flush at end of run — persist migrated keys.
        return ent

    def _rows_sha(cols: list, rows: list) -> str:
        h = hashlib.sha256()
        h.update("\x1d".join(cols).encode())
        for r in sorted(rows):
            h.update(b"\x1e")
            h.update("\x1f".join(r).encode())
        return h.hexdigest()

    def _strict_cached(name: str, df, sql: str) -> None:
        """The strict (driver-hash) compare with the DuckDB half
        cached as (cols, count, sha256 over canonicalized sorted
        rows) — value-equivalent to oracle_check.compare up to sha
        collision. A cache-hit mismatch falls back to the REAL
        compare for row-level diagnostics (and so a stale cache can
        only cost time, never a wrong verdict)."""
        nonlocal n_cache_hits
        key = hashlib.sha256(
            "\x1f".join(["strict-v1", name, sf_fp, sql]).encode()
        ).hexdigest()[:32]
        key_old = hashlib.sha256(
            "\x1f".join(["strict-v1", name, sf_fp_old, sql]).encode()
        ).hexdigest()[:32]
        s_cols, s_rows = spark_strict(df)
        ent = _cache_lookup(key, key_old)
        if ent is not None:
            if (
                ent["cols"] == s_cols
                and ent["n"] == len(s_rows)
                and ent["sha"] == _rows_sha(s_cols, s_rows)
            ):
                n_cache_hits += 1
                return
            compare(df, con, sql, name)  # authoritative diagnostics
            return
        d_cols, d_rows = duck_strict(con, sql)
        assert s_cols == d_cols, (
            f"[{name}] columns differ: spark={s_cols} duckdb={d_cols}"
        )
        assert len(s_rows) == len(d_rows), (
            f"[{name}] row counts differ: spark={len(s_rows)} "
            f"duckdb={len(d_rows)}"
        )
        for i, (a, b) in enumerate(zip(sorted(s_rows), sorted(d_rows))):
            assert a == b, (
                f"[{name}] first strict (driver-hash) mismatch at sorted "
                f"row {i}:\n  spark={a}\n  duckdb={b}"
            )
        cache[key] = {
            "name": name,
            "cols": d_cols,
            "n": len(d_rows),
            "sha": _rows_sha(d_cols, d_rows),
        }
        _flush_cache()

    t_start = time.time()
    entry_rows = len(mod.entry(spark).collect())
    results: dict[str, dict] = {}
    artifact: dict = {"sf_dir": sf_dir, "n_queries": len(names), "queries": results}
    n_green = n_rows_only = n_fail = 0
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                # fact-scale results can't round-trip the Py4J collect
                # path; above the threshold compare engine-side digests
                # instead (same value gate, no driver materialization)
                fields = {f.name: f.dataType for f in df.schema.fields}
                if not digest_unsupported(fields):
                    # digest-capable: the deterministic DuckDB half
                    # (count + chunk sums) comes from the cache when
                    # (sql, schema, data) are unchanged; the Spark half
                    # always runs fresh
                    key = _cache_key(name, sf_fp, oracles[name], fields)
                    ent = _cache_lookup(
                        key, _cache_key(name, sf_fp_old, oracles[name], fields)
                    )
                    if ent is None:
                        d_cols, d_n, d_d1, d_d2 = duck_digest(
                            con, oracles[name], fields
                        )
                        ent = {
                            "name": name,
                            "cols": d_cols,
                            "n": d_n,
                            "d1": str(d_d1),
                            "d2": str(d_d2),
                        }
                        cache[key] = ent
                        _flush_cache()
                    else:
                        n_cache_hits += 1
                    n_oracle = ent["n"]
                    if n_oracle > digest_rows:
                        s_n, s_d1, s_d2 = spark_digest(df)
                        assert sorted(fields) == ent["cols"], (
                            f"[{name}] columns differ: spark="
                            f"{sorted(fields)} duckdb={ent['cols']}"
                        )
                        assert s_n == n_oracle, (
                            f"[{name}] row counts differ: spark={s_n} "
                            f"duckdb={n_oracle}"
                        )
                        assert (str(s_d1), str(s_d2)) == (ent["d1"], ent["d2"]), (
                            f"[{name}] value digests differ over {s_n} rows:\n"
                            f"  spark=({s_d1}, {s_d2})\n"
                            f"  duckdb=({ent['d1']}, {ent['d2']})"
                        )
                        status = "GREEN-digest"
                    else:
                        _strict_cached(name, df, oracles[name])
                        status = "GREEN"
                else:
                    # digest-incapable result schema: strict with the
                    # cached DuckDB half (these names are small by
                    # construction — a huge digest-incapable result
                    # would already have failed the r8+ gates)
                    _strict_cached(name, df, oracles[name])
                    status = "GREEN"
                n_green += 1
            else:
                status = f"rows-only:{df.count()}"
                n_rows_only += 1
            err = None
        except Exception as e:  # noqa: BLE001 - artifact records everything
            status = "FAIL"
            err = f"{type(e).__name__}: {e}"[:400]
            n_fail += 1
            traceback.print_exc()
        wall = round(time.time() - t0, 3)
        results[name] = {"status": status, "sec": wall, **({"err": err} if err else {})}
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({wall}s)", flush=True)
        # incremental checkpoint: a multi-hour sf10 gate that dies at
        # name 200 must leave the 199 finished rows on disk, not lose
        # them with the process (the banked oracle digests already
        # survive; this makes the ENGINE-side progress survive too)
        artifact = {
            "sf_dir": sf_dir,
            "n_oracle_cache_hits": n_cache_hits,
            "n_queries": len(names),
            "n_done": i + 1,
            "n_green": n_green,
            "n_rows_only": n_rows_only,
            "n_fail": n_fail,
            "entry_rows": entry_rows,
            "total_sec": round(time.time() - t_start, 1),
            "queries": results,
        }
        try:
            Path(out).write_text(json.dumps(artifact, indent=1) + "\n")
        except OSError:
            pass

    Path(out).write_text(json.dumps(artifact, indent=1) + "\n")
    # persist any legacy-key migrations even on an all-cache-hit pass
    # (per-hit flushes were dropped — ADVICE r11)
    _flush_cache()
    print(
        f"\n{n_green} green / {n_rows_only} rows-only / {n_fail} FAIL"
        f"  (entry_rows={entry_rows})  → {out}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
