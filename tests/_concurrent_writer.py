"""Child process for test_concurrency.test_two_driver_processes_*:
its own Spark driver upserting batches into an existing table root.

    python _concurrent_writer.py <table_root> <tag> <n_batches> <keys_per_batch>
"""

import datetime as dt
import sys

from dipper_spark.plans.target import LocalCowTable
from dipper_spark.session import build_session


def main() -> None:
    root, tag, n_batches, per = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    spark = build_session(f"concurrent-writer-{tag}", cores=4, shuffle_partitions=8)
    table = LocalCowTable(spark, root)
    for b in range(n_batches):
        rows = [(f"{tag}-{i}", 0, "user", f"{tag}-b{b}",
                 dt.datetime(2026, 6, 1, 12, b)) for i in range(per)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx long, role string, text string, ts timestamp")
        table.upsert(df, scope=f"proc-{tag}")
    spark.stop()


if __name__ == "__main__":
    main()
