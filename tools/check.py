"""Local mimic of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same sf dir, compares row count, column names, and
values (exact + tolerance). Usage:

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def compare(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> list[str]:
    issues = []
    if len(sdf) != len(odf):
        issues.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        issues.append(f"columns spark={scols} oracle={ocols}")
        return issues
    if len(sdf) != len(odf):
        return issues
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Driver-faithful dtype gate: the driver's value hash distinguishes
        # 3 (int64) from 3.0 (float64) even when values are numerically equal
        # (DuckDB 1.0 types bare integer SUMs as HUGEINT -> float64 via .df()).
        # A kind mismatch (int vs float) is therefore a hard failure here too.
        skind = "f" if pd.api.types.is_float_dtype(sv) else (
            "i" if pd.api.types.is_integer_dtype(sv) else "o")
        okind = "f" if pd.api.types.is_float_dtype(ov) else (
            "i" if pd.api.types.is_integer_dtype(ov) else "o")
        if skind != okind:
            issues.append(
                f"col {c}: dtype kind mismatch spark={sv.dtype} oracle={ov.dtype} "
                f"(driver hash would fail even if values match)"
            )
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            svf = sv.astype(float).to_numpy()
            ovf = ov.astype(float).to_numpy()
            # Signed zero: np.array_equal(0.0, -0.0) is True but the driver's
            # value hash (byte-level) distinguishes them — flag it as a fail.
            zmask = (svf == 0.0) & (ovf == 0.0)
            if zmask.any() and not np.array_equal(
                np.signbit(svf[zmask]), np.signbit(ovf[zmask])
            ):
                nz = (np.signbit(svf[zmask]) != np.signbit(ovf[zmask])).sum()
                issues.append(
                    f"col {c}: {nz} rows differ only in zero sign (+0.0 vs -0.0) "
                    f"— driver hash would fail"
                )
                continue
            exact = np.array_equal(svf, ovf, equal_nan=True)
            if not exact:
                close = np.allclose(svf, ovf, rtol=1e-9, atol=1e-9, equal_nan=True)
                bad = (~np.isclose(svf, ovf, rtol=1e-9, atol=1e-9, equal_nan=True)).sum()
                issues.append(
                    f"col {c}: NOT EXACT ({'close' if close else f'{bad} rows differ'}) "
                    f"e.g. {svf[:3]} vs {ovf[:3]}"
                )
        elif pd.api.types.is_integer_dtype(sv) and pd.api.types.is_integer_dtype(ov):
            if not np.array_equal(sv.to_numpy("int64"), ov.to_numpy("int64")):
                n = (sv.to_numpy("int64") != ov.to_numpy("int64")).sum()
                issues.append(f"col {c}: {n} int rows differ")
        else:
            eq = sv.reset_index(drop=True).equals(ov.reset_index(drop=True))
            if not eq:
                n = (sv.to_numpy() != ov.to_numpy()).sum()
                issues.append(f"col {c}: {n} rows differ e.g. {sv.head(3).tolist()} vs {ov.head(3).tolist()}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from aml_feature_store_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    failed = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            status = "ROWS-ONLY"
            print(f"{status}  {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failed.append(name)
            continue
        issues = compare(sdf, odf, name)
        if issues:
            print(f"FAIL  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            for i in issues[:8]:
                print(f"      {i}")
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows match exactly  [{time.time()-t0:.1f}s]")
    print(f"\n{ran - len(failed)}/{ran} queries OK ({len(qs)} registered)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
