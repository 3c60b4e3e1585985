"""Property-based convergence tests (SURVEY.md §5.2, hypothesis).

Random small logs, then random delivery corruption (permutation,
duplication, chunk splits) of the SAME logical log => the engine's
final state equals the oracle's, and is invariant to the corruption.
LWW algebra: the result is a pure function of the event SET under
(ts, lsn) max-ordering.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dipper_spark.plans.replay import replay
from dipper_spark.testkit.gen import ENVELOPE_ARROW_SCHEMA, to_envelope
from dipper_spark.testkit.oracle import apply_log_pandas, state_hash

from tests.test_replay_equality import _assert_equal


@st.composite
def logical_logs(draw):
    n = draw(st.integers(min_value=5, max_value=80))
    keys = [(f"conv{k}", t) for k in range(3) for t in range(4)]
    rows = []
    base = pd.Timestamp("2026-01-01")
    for lsn in range(1, n + 1):
        conv, turn = draw(st.sampled_from(keys))
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        jitter = draw(st.integers(min_value=-600, max_value=600))
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "ts": base + pd.Timedelta(seconds=lsn * 10 + jitter),
                "conv_id": conv,
                "turn_idx": turn,
                "role": None if op == "D" else "user",
                "text": None if op == "D" else f"text-{conv}-{turn}-{lsn}",
                "tool": None,
                "meta_tokens": lsn,
                "pv": 2,
                "source": "wal0",
                "source_offset": lsn,
            }
        )
    return pd.DataFrame(rows)


def _write_delivery(logical: pd.DataFrame, out_dir: str, perm_seed: int,
                    dup_frac: float, n_chunks: int) -> None:
    env = to_envelope(logical)
    rng = np.random.RandomState(perm_seed)
    n_dup = int(len(env) * dup_frac)
    if n_dup:
        env = pd.concat([env, env.sample(n=n_dup, random_state=rng)], ignore_index=True)
    env = env.sample(frac=1.0, random_state=rng).reset_index(drop=True)
    os.makedirs(out_dir, exist_ok=True)
    for ci, rows in enumerate(np.array_split(np.arange(len(env)), n_chunks)):
        tbl = pa.Table.from_pandas(env.iloc[rows], schema=ENVELOPE_ARROW_SCHEMA, preserve_index=False)
        pq.write_table(tbl, os.path.join(out_dir, f"chunk_{ci:05d}.parquet"))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(logical=logical_logs(),
       perm_seed=st.integers(min_value=0, max_value=2**16),
       dup_frac=st.sampled_from([0.0, 0.2, 0.6]),
       n_chunks=st.integers(min_value=1, max_value=4))
def test_replay_invariant_to_delivery(spark, tmp_path_factory, logical, perm_seed, dup_frac, n_chunks):
    tmp = tmp_path_factory.mktemp("prop")
    _write_delivery(logical, str(tmp / "log"), perm_seed, dup_frac, n_chunks)
    table, _ = replay(spark, str(tmp / "log"), str(tmp / "tbl"))
    oracle = apply_log_pandas(logical)
    _assert_equal(table.snapshot().toPandas(), oracle)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(logical=logical_logs(), chunk_lsn=st.sampled_from([7, 23, 1000]))
def test_replay_invariant_to_batch_split(spark, tmp_path_factory, logical, chunk_lsn):
    tmp = tmp_path_factory.mktemp("propsplit")
    _write_delivery(logical, str(tmp / "log"), 1, 0.0, 2)
    table, _ = replay(spark, str(tmp / "log"), str(tmp / "tbl"), chunk_lsn=chunk_lsn)
    assert state_hash(table.snapshot().toPandas()) == state_hash(apply_log_pandas(logical))


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(logical=logical_logs(),
       perm_seed=st.integers(min_value=0, max_value=2**16),
       dup_frac=st.sampled_from([0.0, 0.4]))
def test_slim_collapse_equals_carry(spark, tmp_path_factory, logical, perm_seed, dup_frac):
    """The two collapse strategies are the same pure function of the
    event set: winner-lsn semi-join (slim) == payload-carrying (carry)
    under random delivery corruption."""
    tmp = tmp_path_factory.mktemp("propslim")
    _write_delivery(logical, str(tmp / "log"), perm_seed, dup_frac, 2)
    t1, _ = replay(spark, str(tmp / "log"), str(tmp / "t1"), collapse="carry")
    t2, _ = replay(spark, str(tmp / "log"), str(tmp / "t2"), collapse="slim")
    h1 = state_hash(t1.snapshot().toPandas())
    assert h1 == state_hash(t2.snapshot().toPandas())
    assert h1 == state_hash(apply_log_pandas(logical))
