"""General distributed equi-join where BOTH sides stream (no broadcast, no
driver-side key sets).

This is the operator the reference's large join shapes need at corpus scale
(``backend/Indexer.py:188`` postings ⋈ docInfo, ``backend/Query.py:281-286``
docInfo lookup): the small-side broadcast pattern in ``__ray_entry__`` stops
working when both sides are corpus-sized.

Shape (generalizing the co-partition pattern proven in
``stages/windows.py:20-62``): tag each side, hash-bucket the join key into
``num_buckets`` FAT groups (not one group per distinct key — millions of
one-row groups is the slow path; 64-512 fat buckets is the scale path, same
as the stem-hash buckets in ``pipelines/filter_index.py``), co-partition
with ONE ``groupby(_bucket)`` shuffle, and run an ordinary pandas hash merge
inside each bucket.  Only the two projected sides enter the shuffle; the
bucket hash is deterministic (``pandas.util.hash_pandas_object`` with a
fixed hash key) so the same key always lands in the same bucket on every
node.

Skew note: one bucket holds ~1/num_buckets of the key space; a single hot
key cannot be split further by bucketing alone — salt the hot key upstream
(duplicate the small side per salt) as documented in ray_guide.md.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_HASH_KEY = "spidey-join-0000"  # 16 bytes, fixed: deterministic across workers


def _bucket_of(df: pd.DataFrame, on: list[str], num_buckets: int) -> np.ndarray:
    # categorize=False: pandas' factorize C-hashtable truncates strings at a
    # NUL byte, which would collide distinct composite keys; \x1f separator
    # keeps composite keys unambiguous for ordinary text
    key = (df[on].astype(str).agg("\x1f".join, axis=1)
           if len(on) > 1 else df[on[0]])
    h = pd.util.hash_pandas_object(
        key, index=False, hash_key=_HASH_KEY, categorize=False)
    return (h % num_buckets).astype(np.int32).to_numpy()


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    how: str = "inner",
    num_buckets: int = 64,
    suffix: str = "_right",
) -> "ray.data.Dataset":
    """Distributed equi-join of two streaming Datasets.

    ``how``: ``inner`` | ``left`` | ``semi`` | ``anti`` (semi/anti return
    left columns only).  Right-side non-key columns that collide with left
    names get ``suffix``.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    on = [on] if isinstance(on, str) else list(on)

    l_schema = left.schema()
    r_schema = right.schema()
    left_cols = list(l_schema.names)
    right_val_cols = [c for c in r_schema.names if c not in on]
    rename = {c: (c + suffix if c in left_cols else c) for c in right_val_cols}
    out_right_cols = [rename[c] for c in right_val_cols]

    # original Arrow dtypes, for restoring ints the union's null-fill demoted
    # to float64 in pandas groups
    l_dtypes = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_dtypes = {rename.get(n, n): t
                for n, t in zip(r_schema.names, r_schema.types)}

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_side=np.int8(0))
        df["_bucket"] = _bucket_of(df, on, num_buckets)
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns=rename).assign(_side=np.int8(1))
        df["_bucket"] = _bucket_of(df, on, num_buckets)
        return df

    def _is_int(t) -> bool:
        # ds.schema().types yields pa.DataType for Arrow blocks but numpy /
        # python dtypes for pandas blocks — accept both
        if isinstance(t, pa.DataType):
            return pa.types.is_integer(t)
        try:
            return np.issubdtype(np.dtype(t), np.integer)
        except TypeError:
            return False

    def _restore(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
        # side-split rows have no nulls of their own: cast back to int where
        # the source type was integral but null-fill made the column float
        for c, t in dtypes.items():
            if c in df.columns and _is_int(t) and df[c].dtype == np.float64:
                df[c] = df[c].astype(np.int64)
        return df

    empty_out_cols = (left_cols if how in ("semi", "anti")
                      else left_cols + out_right_cols)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = _restore(g.loc[g["_side"] == 0, left_cols].copy(), l_dtypes)
        rg = _restore(g.loc[g["_side"] == 1, on + out_right_cols].copy(),
                      r_dtypes)
        if how == "semi":
            if rg.empty or lg.empty:
                return pd.DataFrame(columns=empty_out_cols)
            keys = rg[on].drop_duplicates()
            return lg.merge(keys, on=on, how="inner")
        if how == "anti":
            if rg.empty:
                return lg
            keys = rg[on].drop_duplicates()
            m = lg.merge(keys, on=on, how="left", indicator=True)
            return m.loc[m["_merge"] == "left_only", left_cols]
        if lg.empty or (rg.empty and how == "inner"):
            return pd.DataFrame(columns=empty_out_cols)
        return lg.merge(rg, on=on, how=how)

    l_tag = left.map_batches(tag_left, batch_format="pandas")
    r_tag = right.map_batches(tag_right, batch_format="pandas")
    return l_tag.union(r_tag).groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")


def semi_join(left, right, on, num_buckets: int = 64):
    """Left rows whose key appears in right (both sides stream)."""
    return hash_join(left, right, on, how="semi", num_buckets=num_buckets)


def anti_join(left, right, on, num_buckets: int = 64):
    """Left rows whose key does NOT appear in right (both sides stream)."""
    return hash_join(left, right, on, how="anti", num_buckets=num_buckets)
