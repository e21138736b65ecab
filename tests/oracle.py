"""Independent pandas/numpy oracle implementations for golden tests.

Deliberately written against pandas semantics (not by calling the engine)
so the Spark pipeline and the oracle can only agree by being correct.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_FREQ = {"raw": "min", "hourly": "h", "daily": "D", "monthly": "MS"}


def rollup_oracle(pdf: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Per (source, bucket) rollup of a sequences frame, straight from raw."""
    d = pdf.copy()
    d["bucket_start"] = d["ts"].dt.floor(_FREQ[tier]) if tier != "monthly" else (
        d["ts"].dt.to_period("M").dt.to_timestamp()
    )
    g = d.groupby(["source", "bucket_start"])["n_tok"]
    out = g.agg(n_seq="count", n_tok_sum="sum", n_tok_min="min", n_tok_max="max").reset_index()
    out["n_tok_mean"] = out["n_tok_sum"] / out["n_seq"]
    return out.sort_values(["source", "bucket_start"]).reset_index(drop=True)


def gapfill_oracle(rollup: pd.DataFrame, tier: str, value_cols: list[str]) -> pd.DataFrame:
    """Dense spine per source + np.interp linear fill of interior gaps."""
    freq = _FREQ[tier]
    frames = []
    for src, g in rollup.groupby("source"):
        g = g.sort_values("bucket_start").set_index("bucket_start")
        spine = pd.date_range(g.index.min(), g.index.max(), freq=freq)
        dense = g.reindex(spine)
        dense["gapfilled"] = dense["n_seq"].isna()
        xs = spine.astype("int64").astype("float64")
        obs = ~dense["gapfilled"].to_numpy()
        for c in value_cols:
            y = dense[c].to_numpy(dtype="float64")
            dense[c] = np.interp(xs, xs[obs], y[obs])
        dense["source"] = src
        frames.append(dense.reset_index(names="bucket_start"))
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["source", "bucket_start"]).reset_index(drop=True)


def token_hist_oracle(pdf: pd.DataFrame, tier: str) -> dict[tuple, dict[int, int]]:
    d = pdf.copy()
    d["bucket_start"] = d["ts"].dt.floor(_FREQ[tier]) if tier != "monthly" else (
        d["ts"].dt.to_period("M").dt.to_timestamp()
    )
    out: dict[tuple, dict[int, int]] = {}
    for (src, b), g in d.groupby(["source", "bucket_start"]):
        hist: dict[int, int] = {}
        for toks in g["tokens"]:
            for t in toks:
                hist[int(t)] = hist.get(int(t), 0) + 1
        out[(src, b.to_pydatetime())] = hist
    return out
