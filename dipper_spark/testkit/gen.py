"""Deterministic changelog generator (SURVEY.md op C18, FIXTURES.md §B).

Generates the binlog/WAL-style change-event log the engine tails:
  - every (conv_id, turn_idx) key gets exactly one initial 'I' before
    any 'U'/'D' of that key in LSN (commit) order;
  - extra events (updates / deletes / re-inserts after delete) are
    skewed: `hot_frac` of them hit one hottest conversation, the rest
    follow a power-law over the remaining conversations — this is the
    skew that op C7's salting must defuse;
  - event time `ts` is the commit time plus bounded jitter
    (`max_disorder`), producing genuinely out-of-order event time, so
    the LWW winner per key is argmax(ts, lsn) — NOT simply max lsn;
  - delivery corruption is applied to the *file layout only*:
    `dup_rate` re-emits events (same lsn), `shuffle_window` writes
    events out of LSN order, `n_chunks` splits into files for
    streaming triggers and kill/resume tests.  The logical log stays
    the oracle's truth.

All derivations are splitmix64 hashes of (seed, indices) over numpy
uint64 arrays — bit-for-bit reproducible at any scale.
"""

from __future__ import annotations

import json
import os
import unicodedata
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH0 = np.datetime64("2026-01-01T00:00:00", "us")

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array."""
    z = (x + _GOLD).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= _M1
    z ^= z >> np.uint64(27)
    z *= _M2
    z ^= z >> np.uint64(31)
    return z


def hash64(*parts: np.ndarray | int) -> np.ndarray:
    """Combine any number of integer arrays/scalars into one uint64 hash."""
    acc = np.uint64(0x243F6A8885A308D3)
    with np.errstate(over="ignore"):
        for p in parts:
            a = np.asarray(p, dtype=np.uint64)
            acc = _mix(acc ^ _mix(a))
    return acc


def _frac(h: np.ndarray) -> np.ndarray:
    """uint64 hash -> uniform float64 in [0, 1)."""
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


_B64 = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_", dtype="S1"
)


def _token(h: np.ndarray, n_chars: int = 10) -> np.ndarray:
    """Deterministic base64-ish token per hash (vectorized)."""
    out = np.empty((len(h), n_chars), dtype="S1")
    z = h.copy()
    for c in range(n_chars):
        out[:, c] = _B64[(z & np.uint64(63)).astype(np.int64)]
        z = _mix(z)
    return out.view(f"S{n_chars}").ravel().astype(str)


# Unicode / whitespace edge cases injected every 13th row to exercise
# normalization (op C3): NFC vs NFD pairs + leading/trailing whitespace.
_EDGE_PREFIXES = [
    "",  # plain
    "éclair ",  # é NFC
    "éclair ",  # é NFD (same text after NFC-normalization)
    "  leading ",
    "café​ ",  # zero-width space kept (NFC leaves it)
]
_EDGE_SUFFIXES = ["", " trailing  ", "\t", " ñõ "]  # ño NFD-ish mix


def _make_text(conv: np.ndarray, turn: np.ndarray, salt: np.ndarray, seed: int) -> pd.Series:
    """Deterministic per-(key, salt) text with unicode edge cases."""
    h = hash64(seed, 0x7E57, conv, turn, salt)
    core = _token(h, 12)
    pre_i = (h % np.uint64(13)).astype(np.int64)
    suf_i = ((h >> np.uint64(8)) % np.uint64(11)).astype(np.int64)
    pres = np.array(_EDGE_PREFIXES, dtype=object)
    sufs = np.array(_EDGE_SUFFIXES, dtype=object)
    pre = np.where(pre_i < len(_EDGE_PREFIXES), pres[np.minimum(pre_i, len(_EDGE_PREFIXES) - 1)], "")
    suf = np.where(suf_i < len(_EDGE_SUFFIXES), sufs[np.minimum(suf_i, len(_EDGE_SUFFIXES) - 1)], "")
    base = pd.Series(conv).astype(str) + ":" + pd.Series(turn).astype(str) + ":" + pd.Series(core)
    return pd.Series(pre, dtype=object) + base + pd.Series(suf, dtype=object)


def normalize_text(s: str | None) -> str | None:
    """THE canonical text normalization — engine (vectorized, op C3) and
    oracle (here) must agree exactly: Unicode NFC + strip edges."""
    if s is None:
        return None
    return unicodedata.normalize("NFC", s).strip()


@dataclass
class ChangelogSpec:
    seed: int = 42
    n_conv: int = 500
    max_turns: int = 8  # turns per conv in [1, max_turns]
    extra_rate: float = 0.6  # extra (U/D/reinsert) events per insert
    hot_frac: float = 0.3  # fraction of extras hitting the hottest conv
    max_disorder_s: int = 120  # event-time jitter bound (seconds)
    dup_rate: float = 0.05  # fraction of events re-delivered (same lsn)
    shuffle_window: int = 50  # delivery-order scramble window
    n_chunks: int = 4  # number of delivery files
    n_sources: int = 4  # WAL partitions of origin
    evolution_lsn_frac: float | None = None  # None => all payloads v2 (full);
    # else events with lsn <= frac*N carry v1 payloads ({role,text} only)
    meta: dict = field(default_factory=dict)


def gen_logical_log(spec: ChangelogSpec) -> pd.DataFrame:
    """Build the logical (truth) log: one row per unique lsn, in lsn order.

    Columns: lsn, op, ts, conv_id, turn_idx, role, text, tool,
    meta_tokens, source, source_offset, pv (payload version).
    """
    seed = spec.seed
    conv_ids = np.arange(spec.n_conv, dtype=np.uint64)
    turns_per = 1 + (hash64(seed, 1, conv_ids) % np.uint64(spec.max_turns)).astype(np.int64)

    # --- initial inserts: one per key ---
    conv_i = np.repeat(conv_ids.astype(np.int64), turns_per)
    turn_i = np.concatenate([np.arange(n, dtype=np.int64) for n in turns_per])
    n_ins = len(conv_i)

    # conversation start staggered hourly, 7s per turn
    ins_commit = (conv_i % 100_000) * 3_600_000_000 + turn_i * 7_000_000  # µs offsets

    # --- extra events (U / D / reinsert-I), skewed ---
    n_extra = int(round(n_ins * spec.extra_rate))
    ei = np.arange(n_extra, dtype=np.uint64)
    h_key = hash64(seed, 2, ei)
    u = _frac(h_key)
    hot = u < spec.hot_frac
    # power-law over the non-hot conversations (rank ~ u^3 biases low ranks)
    u2 = _frac(hash64(seed, 3, ei))
    cold_conv = np.minimum((u2**3 * max(spec.n_conv - 1, 1)).astype(np.int64) + 1, spec.n_conv - 1)
    conv_e = np.where(hot, 0, cold_conv if spec.n_conv > 1 else 0)
    turn_e = (hash64(seed, 4, ei) % turns_per[conv_e].astype(np.uint64)).astype(np.int64)

    h_op = hash64(seed, 5, ei) % np.uint64(100)
    op_e = np.where(h_op < 80, "U", np.where(h_op < 92, "D", "I")).astype(object)

    # commit time: strictly after the key's insert
    key_commit = (conv_e % 100_000) * 3_600_000_000 + turn_e * 7_000_000
    delay = 1_000_000 + (hash64(seed, 6, ei) % np.uint64(86_400)).astype(np.int64) * 1_000_000
    ext_commit = key_commit + delay

    conv_all = np.concatenate([conv_i, conv_e])
    turn_all = np.concatenate([turn_i, turn_e])
    op_all = np.concatenate([np.full(n_ins, "I", dtype=object), op_e])
    commit_all = np.concatenate([ins_commit, ext_commit])

    # total commit order -> lsn 1..N (ties broken by a hash, inserts first)
    tiebreak = hash64(seed, 7, np.arange(len(conv_all), dtype=np.uint64))
    is_extra = np.concatenate([np.zeros(n_ins, np.int8), np.ones(n_extra, np.int8)])
    order = np.lexsort((tiebreak, is_extra, commit_all))
    n = len(order)
    lsn = np.empty(n, dtype=np.int64)
    lsn[order] = np.arange(1, n + 1)

    # event time = commit time + bounded jitter (out-of-order event time)
    jit_h = hash64(seed, 8, lsn.astype(np.uint64))
    jitter = ((jit_h % np.uint64(2 * spec.max_disorder_s + 1)).astype(np.int64) - spec.max_disorder_s) * 1_000_000
    ts_us = commit_all + jitter
    ts = EPOCH0 + ts_us.astype("timedelta64[us]")

    # roles: alternate user/assistant; ~15% tool turns by hash of the key
    h_role = hash64(seed, 9, conv_all.astype(np.uint64), turn_all.astype(np.uint64))
    is_tool = (h_role % np.uint64(100)) < np.uint64(15)
    role = np.where(is_tool, "tool", np.where(turn_all % 2 == 0, "user", "assistant")).astype(object)
    tool = np.where(is_tool, pd.Series(hash64(seed, 10, h_role) % np.uint64(8)).map(lambda x: f"tool{x}").to_numpy(object), None)

    # text: I events use salt=0 (base text); U/reinsert use salt=lsn so
    # the LWW winner is checkable
    salt = np.where(op_all == "I", 0, lsn).astype(np.uint64)
    text = _make_text(conv_all.astype(np.uint64), turn_all.astype(np.uint64), salt, seed)
    meta_tokens = (hash64(seed, 11, salt, h_role) % np.uint64(512)).astype(np.int64)

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op_all,
            "ts": ts,
            "conv_id": pd.Series(conv_all).map(lambda j: f"conv{j:08d}"),
            "turn_idx": turn_all.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "meta_tokens": meta_tokens,
        }
    ).sort_values("lsn", ignore_index=True)

    # deletes carry no payload content
    d = df["op"] == "D"
    df.loc[d, ["role", "text", "tool"]] = None

    # payload version: v1 early events lack tool/meta (schema evolution)
    if spec.evolution_lsn_frac is not None:
        df["pv"] = np.where(df["lsn"] <= int(spec.evolution_lsn_frac * n), 1, 2)
    else:
        df["pv"] = 2

    # provenance: WAL partition of origin + per-source offset
    src = (hash64(spec.seed, 12, df["lsn"].to_numpy(np.uint64)) % np.uint64(spec.n_sources)).astype(np.int64)
    df["source"] = pd.Series(src).map(lambda p: f"wal{p}")
    df["source_offset"] = df.groupby("source").cumcount().astype(np.int64)
    return df


def _json_str(s: pd.Series) -> pd.Series:
    """Vectorized JSON string literal: fast path for strings without
    escapes (the overwhelming majority), json.dumps for the rest."""
    s = s.astype(object)
    out = '"' + s.fillna("") + '"'
    needs = s.astype("string").str.contains(r'["\\\x00-\x1f]', regex=True, na=False).to_numpy()
    if needs.any():
        out[needs] = s[needs].map(lambda x: json.dumps(x, ensure_ascii=False))
    return out


def to_envelope(logical: pd.DataFrame) -> pd.DataFrame:
    """Logical log -> wire envelope (payload JSON-encoded, vectorized —
    the per-row json.dumps loop was the 10^7-event generation
    bottleneck)."""
    role_j = _json_str(logical["role"])
    text_j = _json_str(logical["text"])
    tool_j = _json_str(logical["tool"])
    has_tool = logical["tool"].notna() & (logical["pv"] >= 2)
    v2 = logical["pv"] >= 2

    payload = '{"role":' + role_j + ',"text":' + text_j
    payload = payload + np.where(has_tool, ',"tool":' + tool_j, "")
    payload = payload + np.where(
        v2, ',"meta":{"tokens":' + logical["meta_tokens"].astype(str) + "}}", "}"
    )
    payload = pd.Series(payload, index=logical.index).where(logical["op"] != "D", None)
    return pd.DataFrame(
        {
            "lsn": logical["lsn"].astype(np.int64),
            "op": logical["op"].astype(str),
            "ts": logical["ts"],
            "conv_id": logical["conv_id"].astype(str),
            "turn_idx": logical["turn_idx"].astype(np.int32),
            "payload": payload,
            "source": logical["source"].astype(str),
            "source_offset": logical["source_offset"].astype(np.int64),
        }
    )


ENVELOPE_ARROW_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("ts", pa.timestamp("us")),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("payload", pa.string()),
        ("source", pa.string()),
        ("source_offset", pa.int64()),
    ]
)


def write_changelog(logical: pd.DataFrame, out_dir: str, spec: ChangelogSpec) -> dict:
    """Apply delivery corruption (dups, reorder) and write chunk files.

    Returns a manifest dict {n_events, n_delivered, n_dups, chunks}.
    """
    env = to_envelope(logical)
    n = len(env)

    # duplicates: re-deliver selected events verbatim (same lsn)
    h_dup = hash64(spec.seed, 13, env["lsn"].to_numpy(np.uint64))
    dup_mask = _frac(h_dup) < spec.dup_rate
    dups = env[dup_mask]
    delivered = pd.concat([env, dups], ignore_index=True)

    # bounded out-of-order delivery: position = index + hash-jitter
    idx = np.arange(len(delivered), dtype=np.int64)
    w = spec.shuffle_window
    jit = (hash64(spec.seed, 14, idx.astype(np.uint64)) % np.uint64(2 * w + 1)).astype(np.int64) - w
    delivered = delivered.iloc[np.argsort(idx + jit, kind="stable")].reset_index(drop=True)

    os.makedirs(out_dir, exist_ok=True)
    chunks = np.array_split(np.arange(len(delivered)), spec.n_chunks)
    files = []
    for ci, rows in enumerate(chunks):
        path = os.path.join(out_dir, f"chunk_{ci:05d}.parquet")
        tbl = pa.Table.from_pandas(delivered.iloc[rows], schema=ENVELOPE_ARROW_SCHEMA, preserve_index=False)
        # small row groups keep chunk files splittable -> scan parallelism
        # is bounded by data size, not by the number of delivery files
        pq.write_table(tbl, path, row_group_size=65536)
        files.append(path)
    manifest = {
        "n_events": int(n),
        "n_delivered": int(len(delivered)),
        "n_dups": int(dup_mask.sum()),
        "chunks": files,
        "spec": {k: v for k, v in spec.__dict__.items() if k != "meta"},
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def gen_changelog(out_dir: str, spec: ChangelogSpec | None = None, **knobs) -> tuple[pd.DataFrame, dict]:
    """One-shot: build logical log, write corrupted delivery files.

    Returns (logical_log, manifest)."""
    if spec is None:
        spec = ChangelogSpec(**knobs)
    logical = gen_logical_log(spec)
    manifest = write_changelog(logical, out_dir, spec)
    return logical, manifest
