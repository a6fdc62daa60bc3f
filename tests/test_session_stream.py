"""UDF-tier session-window streaming: parity vs a pandas islands oracle."""

import numpy as np
import pandas as pd
import pytest

from tsflex_spark.features.function_wrapper import FuncWrapper
from tsflex_spark.streaming.stateful import session_features_stream_udf

GAP = pd.Timedelta("10min")


def _sessions_oracle(pdf, gap_us=int(GAP.total_seconds() * 1e6)):
    """Per-key gap-islands with python: split where diff >= gap."""
    out = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        t = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        cut = np.concatenate([[0], np.flatnonzero(np.diff(t) >= gap_us) + 1, [len(t)]])
        for lo, hi in zip(cut[:-1], cut[1:]):
            v = g["v"].to_numpy()[lo:hi]
            out.append(
                {
                    "user_id": uid,
                    "session_start": pd.Timestamp(t[lo] * 1000),
                    "session_end": pd.Timestamp((t[hi - 1] + gap_us) * 1000),
                    "n_events": hi - lo,
                    "v__iqr__w=session": float(
                        np.quantile(v, 0.75) - np.quantile(v, 0.25)
                    ),
                    "v__mysum__w=session": float(v.sum()),
                }
            )
    return (
        pd.DataFrame(out)
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


def test_session_stream_udf_parity(spark, tmp_path):
    rng = np.random.default_rng(7)
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for uid in (0, 1):
        t = base
        for burst in range(4):  # 4 sessions per key, 10-40 events each
            n = int(rng.integers(10, 40))
            ts = t + pd.to_timedelta(np.cumsum(rng.integers(5, 120, n)), unit="s")
            rows.append(
                pd.DataFrame(
                    {"ts": ts, "user_id": uid, "v": rng.normal(10, 3, n).round(2)}
                )
            )
            t = ts[-1] + pd.Timedelta("30min")  # > gap -> new session
    pdf = pd.concat(rows, ignore_index=True).sort_values("ts")
    sentinel = pd.DataFrame(
        {"ts": [pdf["ts"].max() + pd.Timedelta("6h")], "user_id": [0], "v": [0.0]}
    )

    src = str(tmp_path / "src")
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(src)
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(src, mode="append")
    spark.createDataFrame(sentinel).coalesce(1).write.parquet(src, mode="append")

    def iqr(x: np.ndarray) -> float:
        return float(np.quantile(x, 0.75) - np.quantile(x, 0.25))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = session_features_stream_udf(
        stream,
        "10min",
        [("v", iqr), ("v", FuncWrapper(lambda x: float(x.sum()), output_names="mysum"))],
        ts_col="ts",
        key_cols=["user_id"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sfs_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("sfs_sink")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    exp = _sessions_oracle(pdf)  # sentinel's own session never closes
    # the sentinel session for user 0 may or may not be absent; drop it if present
    got = got[got["session_start"] <= pdf["ts"].max()].reset_index(drop=True)
    assert len(got) == len(exp) == 8
    for c in ["user_id", "n_events"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    for c in ["session_start", "session_end"]:
        assert got[c].equals(exp[c]), c
    for c in ["v__iqr__w=session", "v__mysum__w=session"]:
        np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy(), atol=1e-12)


def test_session_stream_udf_rejects_catalog_strings(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="session_features_stream"):
        session_features_stream_udf(df, "5min", [("value", "mean")], ts_col="timestamp")
    with pytest.raises(ValueError, match="not in stream"):
        session_features_stream_udf(df, "5min", [("nope", lambda x: 1.0)], ts_col="timestamp")
