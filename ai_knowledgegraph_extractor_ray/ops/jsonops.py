"""Semi-structured JSON column extraction — the ``json_extract`` /
``json_value`` family SQL engines provide for string columns carrying
JSON payloads (the reference stores free-form metadata the same way its
API responses carry nested JSON; here the synthetic ``events.props``
column plays that role).

Scale shape: a pure per-block map — zero shuffle, zero driver state.
Parsing is vectorized through polars' Rust JSON kernels
(``str.json_path_match``), not a Python ``json.loads`` per row; a
stdlib fallback exists only for environments without polars and is
clearly the slow path.

Semantics (pinned by the DuckDB ``json_extract_string`` oracle):

- a missing path, JSON ``null``, or an unparsable document yields NULL
- scalar values are extracted as their string form, then cast to the
  requested dtype (``int64`` / ``float64`` / ``string`` / ``bool``);
  a failed cast yields NULL rather than raising (SQL TRY_CAST).
  Divergence note: the int64 cast is STRICT (``'1.5'`` -> NULL) where
  DuckDB's ``TRY_CAST('1.5' AS BIGINT)`` rounds to 2 — the oracle
  comparison holds because the oracled column is integer-valued;
  ``bool`` accepts only the string forms ``true``/``false``
- paths use the ``$.field[.sub]`` JSONPath subset polars and DuckDB
  both implement
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

try:                                    # vectorized Rust path
    import polars as pl
    _HAVE_POLARS = True
except ImportError:                     # pragma: no cover - polars baked in
    _HAVE_POLARS = False

_DTYPES = ("int64", "float64", "string", "bool")


def _extract_block(df: pd.DataFrame, col: str,
                   fields: dict[str, tuple[str, str]]) -> pd.DataFrame:
    if _HAVE_POLARS:
        import pyarrow as pa
        import pyarrow.compute as _pc
        s = pl.Series(col, df[col].astype(object).to_numpy(), dtype=pl.Utf8)
        for out, (path, dtype) in fields.items():
            vals = s.str.json_path_match(path)
            if dtype == "int64":
                # TRY_CAST semantics: non-integer string -> null. Stay on
                # the Arrow path end-to-end: Int64-with-null .to_numpy()
                # would round-trip through float64 and corrupt integers
                # above 2^53 whenever the block contains any null
                arr = vals.cast(pl.Int64, strict=False).to_arrow()
                df[out] = pd.array(arr.to_pandas(
                    integer_object_nulls=True), dtype="Int64")
            elif dtype == "float64":
                v = vals.cast(pl.Float64, strict=False)
                df[out] = v.to_numpy().astype(np.float64)
            elif dtype == "bool":
                # only the string forms 'true'/'false' cast; anything
                # else is a failed cast -> NULL (matches the docstring
                # and the stdlib fallback)
                arr = vals.to_arrow().cast(pa.string())
                t = _pc.equal(arr, "true")
                valid = _pc.or_kleene(t, _pc.equal(arr, "false"))
                res = _pc.if_else(_pc.fill_null(valid, False), t,
                                  pa.nulls(len(arr), pa.bool_()))
                df[out] = pd.array(res.to_pandas(), dtype="boolean")
            else:
                df[out] = vals.to_pandas()
        return df
    return _extract_block_stdlib(df, col, fields)   # pragma: no cover


def _extract_block_stdlib(df: pd.DataFrame, col: str,
                          fields: dict[str, tuple[str, str]]
                          ) -> pd.DataFrame:        # pragma: no cover
    """Slow fallback: stdlib json per row. Correct, not fast — only for
    environments without polars."""
    import json

    def walk(doc: object, path: str) -> object:
        cur = doc
        for part in path.lstrip("$").strip(".").split("."):
            if not isinstance(cur, dict) or part not in cur:
                return None
            cur = cur[part]
        return cur

    def string_form(v: object) -> str | None:
        # polars json_path_match yields the scalar's STRING form; mirror
        # it so both paths share one cast semantics
        if v is None or isinstance(v, (dict, list)):
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    parsed = []
    for raw in df[col].astype(object):
        try:
            parsed.append(json.loads(raw) if raw is not None else None)
        except (TypeError, ValueError):
            parsed.append(None)
    for out, (path, dtype) in fields.items():
        vals = [string_form(walk(p, path)) if p is not None else None
                for p in parsed]
        if dtype == "int64":
            def to_i(v):
                try:
                    return int(v)          # strict: '1.5' -> NULL
                except (TypeError, ValueError):
                    return None
            df[out] = pd.array([to_i(v) for v in vals], dtype="Int64")
        elif dtype == "float64":
            def to_f(v):
                try:
                    return float(v)
                except (TypeError, ValueError):
                    return np.nan
            df[out] = np.array([to_f(v) for v in vals], dtype=np.float64)
        elif dtype == "bool":
            df[out] = pd.array(
                [True if v == "true" else False if v == "false" else None
                 for v in vals], dtype="boolean")
        else:
            df[out] = pd.array(vals, dtype="string")
    return df


def json_extract_columns(ds: rd.Dataset, col: str,
                         fields: dict[str, tuple[str, str]]) -> rd.Dataset:
    """Append one column per ``fields`` entry: ``out_name -> (json_path,
    dtype)`` extracted from the JSON-string column ``col``. Zero-shuffle
    per-block map; see module docstring for NULL/cast semantics."""
    for out, (path, dtype) in fields.items():
        if dtype not in _DTYPES:
            raise ValueError(f"field {out!r}: dtype must be one of "
                             f"{_DTYPES}, got {dtype!r}")
        if not path.startswith("$"):
            raise ValueError(f"field {out!r}: path must start with '$', "
                             f"got {path!r}")
    existing = set(ds.schema().names)
    clash = [o for o in fields if o in existing]
    if clash:
        raise ValueError(f"json output columns already exist: {clash}")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _extract_block(df, col, fields)

    return ds.map_batches(fn, batch_format="pandas")
