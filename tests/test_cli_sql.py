"""--sql CLI mode: ad-hoc Spark SQL over the warehouse directory."""

import json

from beametrics_spark.cli import main


def test_sql_mode_json_lines(spark, sf_dir, capsys):
    rc = main(
        [
            "--sql",
            "SELECT o_orderstatus, count(*) AS n FROM orders "
            "GROUP BY 1 ORDER BY 1",
            "--sql-dir",
            sf_dir,
        ]
    )
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all({"o_orderstatus", "n"} == set(r) for r in rows)
    statuses = [r["o_orderstatus"] for r in rows]
    assert statuses == sorted(statuses)


def test_sql_mode_explain_shows_pushdown(spark, sf_dir, capsys):
    rc = main(
        [
            "--sql",
            "SELECT count(*) AS n FROM orders WHERE o_totalprice > 100000",
            "--sql-dir",
            sf_dir,
            "--explain",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "PushedFilters" in out and "GreaterThan(o_totalprice" in out
