"""Single-threaded reference replay — the oracle (SURVEY.md op C19).

Applies a logical change log in pure pandas, strictly by the spec's
LWW rule: per (conv_id, turn_idx) the winner is argmax over the
(ts, lsn) tuple; a winning 'D' removes the key.  The engine's
distributed replay must produce exactly this table ("per-turn text
equality under stable turn ordering", BASELINE.json input_hint).

Deliberately NOT Spark: an independent implementation for row-diff
tests (`python -m pytest -x -q`), cross-checked against DuckDB.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd

from .gen import normalize_text

SPEC_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def decode_payload_pandas(env: pd.DataFrame) -> pd.DataFrame:
    """Envelope (payload JSON) -> logical columns, for oracle independence.

    Mirrors the engine's vectorized decode (op C3) in plain python.
    """
    roles, texts, tools = [], [], []
    for p in env["payload"]:
        if p is None or (isinstance(p, float) and np.isnan(p)):
            roles.append(None); texts.append(None); tools.append(None)
            continue
        obj = json.loads(p)
        roles.append(obj.get("role"))
        texts.append(obj.get("text"))
        tools.append(obj.get("tool"))
    out = env.copy()
    out["role"] = roles
    out["text"] = texts
    out["tool"] = tools
    return out


def apply_log_pandas(log: pd.DataFrame) -> pd.DataFrame:
    """Replay the log -> final transcript table (six spec columns,
    normalized, sorted by (conv_id, turn_idx)).

    `log` needs columns: lsn, op, ts, conv_id, turn_idx, role, text, tool.
    Duplicate lsns (redelivery) are dropped first; order of the input
    frame is irrelevant — only (ts, lsn) ordering matters.
    """
    df = log.drop_duplicates(subset=["lsn"], keep="first")
    if "pv" in df.columns:
        # v1-era payloads carry no tool/meta keys on the wire — the
        # engine decodes them as null; mirror that here.
        df = df.copy()
        df.loc[df["pv"] < 2, "tool"] = None
    df = df.sort_values(["ts", "lsn"], kind="mergesort")
    winners = df.groupby(["conv_id", "turn_idx"], sort=False).tail(1)
    final = winners[winners["op"] != "D"].copy()
    # engine contract: free text -> NFC + strip (UDF); label columns ->
    # space-trim (JVM btrim)
    final["text"] = final["text"].map(normalize_text)
    for c in ("role", "tool"):
        final[c] = final[c].map(lambda s: s.strip(" ") if isinstance(s, str) else s)
    final = final[SPEC_COLUMNS].sort_values(["conv_id", "turn_idx"], ignore_index=True)
    final["turn_idx"] = final["turn_idx"].astype(np.int32)
    return final


def lineage_totals(log: pd.DataFrame) -> dict:
    """Expected whole-log lineage totals for reconciling op C13 output."""
    uniq = log.drop_duplicates(subset=["lsn"], keep="first")
    winners = uniq.sort_values(["ts", "lsn"]).groupby(["conv_id", "turn_idx"]).tail(1)
    return {
        "events_delivered": int(len(log)),
        "events_unique": int(len(uniq)),
        "dups_dropped": int(len(log) - len(uniq)),
        "keys_touched": int(uniq.groupby(["conv_id", "turn_idx"]).ngroups),
        "final_rows": int((winners["op"] != "D").sum()),
        "final_deleted": int((winners["op"] == "D").sum()),
    }


def state_hash(final: pd.DataFrame) -> str:
    """Order-insensitive sha256 of the final table (canonical strings,
    fully vectorized — used at multi-million-row bench scale).

    Used by the benchmark to prove each run produced the real result.
    """
    df = final.sort_values(["conv_id", "turn_idx"])
    ts = pd.to_datetime(df["ts"]).astype("datetime64[us]").astype("int64").astype(str)
    ts = ts.where(df["ts"].notna(), "")
    canon = (
        df["conv_id"].astype(str)
        + "\x01" + df["turn_idx"].astype(str)
        + "\x01" + df["role"].fillna("")
        + "\x01" + df["text"].fillna("")
        + "\x01" + (df["tool"].fillna("") if "tool" in df.columns else "")
        + "\x01" + ts
    )
    return hashlib.sha256("\x02".join(canon.tolist()).encode("utf-8")).hexdigest()
