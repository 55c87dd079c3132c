"""Z-order layout: correctness of the interleave + actual file
skipping on both dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.operators.zorder import (
    with_zorder,
    write_zordered,
)
from etl_procedure_codes_crawler_spark.sources.parquet import read_testdata


def _files_touched(spark, path, predicate):
    return (
        spark.read.parquet(path)
        .filter(predicate)
        .select(F.input_file_name())
        .distinct()
        .count()
    )


def test_interleave_orders_2d_tiles(spark):
    # 2-D grid: z-values of points in the same quadrant must be closer
    # than across quadrants (the defining Morton property)
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "a int, b int")
    z = {(r.a, r.b): r._zorder for r in with_zorder(df, "a", "b", bits=3).collect()}
    # low-quadrant points all sort before the high-quadrant corner
    assert max(z[(x, y)] for x in range(4) for y in range(4)) < z[(7, 7)]
    # rank-quantization merges ties but must keep most points distinct
    assert len(set(z.values())) >= len(rows) * 0.7


def test_zorder_write_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    events = read_testdata(spark, sf_dir, "events")
    path = str(tmp_path / "ev_z")
    write_zordered(events, path, "user_id", "event_id", num_files=16)

    total = _files_touched(spark, path, F.lit(True))
    assert total >= 8  # layout actually produced many files

    lo_user = _files_touched(spark, path, F.col("user_id") < 5)
    lo_event = _files_touched(spark, path, F.col("event_id") < 100)
    # a selective predicate on EITHER dimension touches a minority of
    # files — single-column sorting could only ever give one of these
    assert lo_user <= total // 2, (lo_user, total)
    assert lo_event <= total // 2, (lo_event, total)

    # layout changed nothing about the data
    assert spark.read.parquet(path).count() == events.count()
