"""DuckDB differential oracle harness (SURVEY.md §5.2 item 1).

Canonicalization mirrors FIXTURES.md's oracle protocol: fixed column
order (sorted by name), rows sorted by all columns, floats rounded to
6 significant digits, then value-hashed.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

TABLES = (
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
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _round_sig(x: float, sig: int = 6) -> float:
    if x == 0 or not math.isfinite(x):
        return x
    return round(x, sig - 1 - int(math.floor(math.log10(abs(x)))))


def _cell(v) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return f"{_round_sig(v):.6g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        "|".join(_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5("\n".join(canonicalize(df)).encode()).hexdigest()


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    report = {
        "rows": (len(spark_pdf), len(duck_pdf)),
        "cols": (sorted(spark_pdf.columns), sorted(duck_pdf.columns)),
        "match": False,
        "first_diff": None,
    }
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if a == b:
        report["match"] = True
        return report
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            report["first_diff"] = {"row": i, "spark": ra, "duck": rb}
            break
    else:
        report["first_diff"] = {"row": min(len(a), len(b)), "note": "row count mismatch"}
    return report
