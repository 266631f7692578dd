"""Driver-style rehearsal: run queries() vs oracle_sql() the way the driver
does (sort columns by name, sort rows, typed value compare) and report
per-query rows/schema/typed-hash matches. Usage:

    python tests/rehearse_driver.py [sf_dir] [q58 q67 ...]

Stricter than tests/test_relational.py: types are NOT coerced (except the
driver's own large_string→string), so DuckDB HUGEINT/DECIMAL artifacts that
break the driver's typed hash are caught here.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(t: pa.Table) -> pa.Table:
    cols = {}
    for name in sorted(t.column_names):
        c = t[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_large_string(c.type):
            c = c.cast(pa.string())
        cols[name] = c
    out = pa.table(cols)
    keys = [(n, "ascending") for n in out.column_names]
    return out.take(pc.sort_indices(out, sort_keys=keys))


def _ray_table(res) -> pa.Table:
    import pandas as pd

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)


def _typed_hash(t: pa.Table) -> str:
    h = hashlib.sha256()
    h.update(str(t.schema).encode())
    for col in t.column_names:
        h.update(repr(t[col].to_pylist()).encode())
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    names = [n for n in sys.argv[2:] if not n.startswith("/")] or [
        n for n in qs if n in sqls
    ]
    names = [next(k for k in qs if k.startswith(n)) if n not in qs else n
             for n in names]

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_bad = 0
    for name in names:
        if name not in sqls:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            got = _normalize(_ray_table(qs[name](sf_dir)))
            want = _normalize(con.execute(sqls[name]).arrow())
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}")
            n_bad += 1
            continue
        rows = got.num_rows == want.num_rows
        schema = got.column_names == want.column_names
        hmatch = rows and schema and _typed_hash(got) == _typed_hash(want)
        flag = "PASS" if hmatch else "FAIL"
        detail = ""
        if not hmatch and rows and schema:
            for col in got.column_names:
                if got[col].type != want[col].type:
                    detail += f" type[{col}]: ray={got[col].type} sql={want[col].type}"
                elif got[col].to_pylist() != want[col].to_pylist():
                    detail += f" values[{col}] differ"
        print(f"{name}: {flag} rows={got.num_rows}/{want.num_rows} "
              f"schema={schema}{detail}")
        n_bad += 0 if hmatch else 1
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
