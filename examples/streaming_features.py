"""Streaming feature extraction: run a batch feature config
incrementally on a file stream, plus O(1)-state running stats. Run:
python examples/streaming_features.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from tsflex_spark import FeatureCollection, FeatureDescriptor
from tsflex_spark.session import get_spark
from tsflex_spark.sources.io import read_events
from tsflex_spark.streaming.stateful import ewma_stream


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_streaming")
    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt1, ckpt2 = f"{tmp}/src", f"{tmp}/c1", f"{tmp}/c2"
        read_events(spark, sf_dir).select(
            "ts", "user_id", "value"
        ).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, value double"
        ).parquet(src)

        # 1) the SAME FeatureCollection API, compiled to a streaming plan
        fc = FeatureCollection(FeatureDescriptor("mean", "value", "5m", "5m"))
        feats = fc.calculate_streaming(
            stream, ts_col="ts", key_cols=["user_id"], watermark="10 minutes"
        )
        q1 = (
            feats.writeStream.format("memory").queryName("feat_sink")
            .option("checkpointLocation", ckpt1)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q1.awaitTermination(120)
        print("windowed feature rows:", spark.table("feat_sink").count())

        # 2) per-key streaming EWMA with two floats of state
        ew = ewma_stream(stream, alpha=0.2, value_col="value",
                         key_cols=["user_id"])
        q2 = (
            ew.writeStream.format("memory").queryName("ewma_sink")
            .option("checkpointLocation", ckpt2)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q2.awaitTermination(120)
        spark.table("ewma_sink").orderBy("user_id").show(5)


if __name__ == "__main__":
    main(*sys.argv[1:])
