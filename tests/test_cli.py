"""CLI entry point: list/run/sql/out paths (the `python -m pkg` user
surface)."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.__main__ import (
    main,
)


def test_list_names_every_registry_query(capsys):
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (
        QUERIES,
    )

    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == len(QUERIES)
    assert out[0].split()[0] in QUERIES


def test_run_shows_query(spark, sf_dir, capsys):
    assert main(["run", "crowded_frames", "--sf", sf_dir, "-n", "3"]) == 0
    out = capsys.readouterr().out
    assert "n_detections" in out


def test_run_unknown_query_errors(capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_out_writes_parquet(spark, sf_dir, tmp_path, capsys):
    dest = str(tmp_path / "out.parquet")
    assert main(["run", "conditional_counts", "--sf", sf_dir, "--out", dest]) == 0
    got = spark.read.parquet(dest)
    want = 5
    assert got.count() == want


def test_sql_over_driver_tables(spark, sf_dir, capsys):
    assert main(["sql", "SELECT count(*) AS n FROM events", "--sf", sf_dir]) == 0
    assert "n" in capsys.readouterr().out
